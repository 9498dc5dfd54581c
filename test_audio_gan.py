"""Shape-compat smoke script for the AudioMNIST BiGAN (successor of the
reference's root-level ``test_audio_gan.py:11-31``): builds E/G/D, runs
E(x,c), G(E(x,c),c), G(z,c), D(x,z,c) and prints shapes.

(Named like the reference script; the real test suite lives in tests/.)
"""
if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecfgen_tpu.models.bigan import BiGAN, audio_mnist_bigan_config
    from imagecfgen_tpu.scm.audio_mnist import CARDINALITIES

    model = BiGAN(audio_mnist_bigan_config())
    b = 2
    x = jnp.zeros((b, 128, 128, 1))
    z = jax.random.normal(jax.random.PRNGKey(0), (b, 1, 1, 512))
    rng = np.random.default_rng(0)
    attrs = {
        k: jnp.asarray(np.eye(n, dtype=np.float32)[rng.integers(0, n, b)])
        for k, n in CARDINALITIES.items()
    }
    key = jax.random.PRNGKey(0)
    vE = jax.jit(lambda: model.encoder.init({"params": key}, x, attrs))()
    vG = jax.jit(lambda: model.generator.init({"params": key}, z, attrs))()
    vD = jax.jit(
        lambda: model.discriminator.init({"params": key}, x, z, attrs, train=False)
    )()

    ex = model.encoder.apply(vE, x, attrs)
    print("E(x, c):", ex.shape)
    rec = model.generator.apply(vG, ex, attrs)
    print("G(E(x, c), c):", rec.shape)
    gz = model.generator.apply(vG, z, attrs)
    print("G(z, c):", gz.shape)
    d = model.discriminator.apply(vD, x, z, attrs, train=False)
    print("D(x, z, c):", d.shape)
    assert ex.shape == (b, 1, 1, 512) and gz.shape == (b, 128, 128, 1) and d.shape == (b, 1)
    print("ok")

    from imagecfgen_tpu.cli.common import clean_exit
    from imagecfgen_tpu.cli.common import install_cli_excepthook
    install_cli_excepthook()
    clean_exit()
