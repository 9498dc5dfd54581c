"""Smoke script for the Morpho-MNIST VAE (successor of the reference's
root-level ``test_vae.py:6-22``): encoder sample, decoder output, scalar
ELBO."""
if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.models.vae import ConditionalVAE, mnist_vae_config

    model = ConditionalVAE(mnist_vae_config())
    b = 2
    x = jnp.zeros((b, 28, 28, 1))
    z = jnp.zeros((b, 1, 1, 512))
    rng = np.random.default_rng(0)
    attrs = {
        "digit": jnp.asarray(np.eye(10, dtype=np.float32)[rng.integers(0, 10, b)]),
        "thickness": jnp.zeros(b),
        "intensity": jnp.zeros(b),
        "slant": jnp.zeros(b),
    }
    key = jax.random.PRNGKey(0)
    vE = jax.jit(lambda: model.encoder.init({"params": key}, x, attrs))()
    vD = jax.jit(lambda: model.decoder.init({"params": key}, z, attrs))()
    params = {"encoder": vE["params"], "decoder": vD["params"]}

    zs = model.encode_sample(params["encoder"], key, x, attrs)
    print("encoder sample:", zs.shape)
    dec = model.decoder.apply({"params": params["decoder"]}, zs, attrs)
    print("decoder:", dec.shape)
    elbo = model.elbo(params, key, x, attrs, num_samples=2)
    print("elbo:", float(elbo))
    assert zs.shape == (b, 1, 1, 512) and dec.shape == (b, 28, 28, 1)
    assert np.isfinite(float(elbo))
    print("ok")

    from imagecfgen_tpu.cli.common import clean_exit
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    clean_exit()
