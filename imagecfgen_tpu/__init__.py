"""imagecfgen_tpu — a TPU-native counterfactual generative-modeling framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the PyTorch
research codebase ``wtaylor17/ImageCFGen-Pytorch`` (conditional ALI/BiGAN image
SCMs, normalizing-flow + Gumbel-max causal attribute SCMs with full
abduct-act-predict counterfactual inference, a DeepSCM conditional-VAE
baseline, evaluation classifiers and CF explainers, and Morpho-MNIST /
AudioMNIST / marine-acoustics data pipelines), re-designed TPU-first:

- functional core: parameters as pytrees, every train step and the full
  counterfactual pass are single jitted XLA programs;
- NHWC layouts and MXU-friendly conv stacks;
- data parallelism via ``jax.sharding`` over a named device mesh (ICI
  collectives inserted by GSPMD), not host-side loops;
- host work (morphometry oracle, dataset synthesis) kept off the device and
  accelerated with native C++ kernels where the Python loop is the bottleneck.

See SURVEY.md at the repo root for the complete component inventory this
framework implements.
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache() -> None:
    """Persistent XLA compilation cache: the big GAN epoch programs take
    45-120 s to compile; caching makes every CLI re-invocation start hot.
    Opt out with IMAGECFGEN_JAX_CACHE=0."""
    cache_dir = _os.environ.get("IMAGECFGEN_JAX_CACHE", "")
    if cache_dir == "0":
        return
    if not cache_dir:
        cache_dir = _os.path.expanduser("~/.cache/imagecfgen_tpu/jax")
    try:
        import jax

        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never fail import over a cache
        pass


_setup_compilation_cache()


def _setup_platform_override() -> None:
    """``IMAGECFGEN_PLATFORM=cpu`` (or tpu) pins the JAX backend through
    jax.config — needed because some PJRT plugins ignore the JAX_PLATFORMS
    environment variable (the axon TPU tunnel does)."""
    platform = _os.environ.get("IMAGECFGEN_PLATFORM")
    if not platform:
        return
    try:
        import jax

        jax.config.update("jax_platforms", platform)
    except Exception:
        pass


_setup_platform_override()
