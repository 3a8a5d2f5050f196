def test_tests_run_on_cpu_mesh():
    import jax
    assert jax.default_backend() == "cpu", jax.devices()
    assert len(jax.devices()) == 8
