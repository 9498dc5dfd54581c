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
