"""Experiment: f32 vs bf16 compute for the audio BiGAN train step."""
import time, numpy as np, jax, jax.numpy as jnp
from imagecfgen_tpu.models.bigan import BiGAN, audio_mnist_bigan_config
from imagecfgen_tpu.scm.audio_mnist import CARDINALITIES
from imagecfgen_tpu.train.gan_trainer import GANTrainer, GANTrainConfig

def run(dtype, label):
    n, b = 512, 128
    rng = np.random.default_rng(0)
    x = rng.uniform(-1,1,(n,128,128,1)).astype(np.float32)
    attrs = {k: np.eye(c,dtype=np.float32)[rng.integers(0,c,n)] for k,c in CARDINALITIES.items()}
    trainer = GANTrainer(BiGAN(audio_mnist_bigan_config(d=64, compute_dtype=dtype)),
                         GANTrainConfig(batch_size=b, betas=(0.5,0.9)))
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = trainer.upload_dataset(x, attrs)
    key = jax.random.PRNGKey(1)
    t0=time.time()
    state, m = trainer.fit_epoch(state, data, key); jax.block_until_ready(m)
    compile_t = time.time()-t0
    state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key,1)); jax.block_until_ready(m)
    t0=time.time()
    reps=10
    for e in range(reps):
        state, m = trainer.fit_epoch(state, data, jax.random.fold_in(key,2+e))
    jax.block_until_ready(m)
    dt=time.time()-t0
    sps = reps*(n//b)/dt
    print(f"{label}: compile {compile_t:.0f}s, {sps:.1f} steps/s, metrics={ {k: round(float(v),4) for k,v in m.items()} }")
    return sps

f32 = run(jnp.float32, "f32")
bf16 = run(jnp.bfloat16, "bf16")
print(f"speedup: {bf16/f32:.2f}x")
