def test_backend():
    import jax
    assert jax.default_backend() == "cpu", jax.default_backend()
