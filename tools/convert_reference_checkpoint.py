"""Convert reference PyTorch checkpoints (.tar) into imagecfgen_tpu format.

The reference saves two inconsistent conventions (whole pickled modules vs
state-dicts — SURVEY §5); this tool reads either via torch (CPU) and maps
the weights onto this framework's parameter trees so trained reference
models are drop-in usable:

    python tools/convert_reference_checkpoint.py \
        --kind mnist-bigan --input mnist-bigan.tar --output mnist-bigan.tar

Supported kinds (reference save/load sites cited):

- ``mnist-bigan``      image_scms/mnist.py:302-313 (state-dict) and
                       train_mnist_image_scm.py:61-67 (whole-module)
- ``audio-bigan``      audiomnist_bigan_score.py:33-37
- ``whale-bigan``      whale_cf_score.py:13-15 (whale_bigan1.tar)
- ``esrf-bigan``       train_esrf_bigan.py / esrf_acoustic.py:280-284
- ``mnist-vae``        train_mnist_vae.py:59-61 ({'vae': module})
- ``audio-vae``        audiomnist_vae_score.py:30
- ``whale-vae``        whale_cf_score.py:17
- ``mnist-clf``        train_mnist_clf.py:25-27 ({'clf'|'model'})
- ``morphomnist-oracle`` train_morphomnist_oracles.py:71-73 ({'oracle'})
- ``audio-clf``        classifiers/audio_mnist.py:198 ({'model'}); pass
                       ``--attribute`` (digit/gender/... or subject)
- ``whale-clf``        whale_cf_score.py:18 ({'clf'})

Security note: state-dict checkpoints load with
``torch.load(weights_only=True)``. Whole-module checkpoints are arbitrary
pickles — loading them **executes code from the file**; the tool falls
back to ``weights_only=False`` only after the safe path fails, prints a
prominent warning, and requires the reference sources on ``sys.path``
(``--reference-path``, default /root/reference) plus import shims for the
reference's absent deps (pytorch_msssim, torchaudio, librosa, pyro).

- ``attribute-scm``    train_mnist_attribute_scm.py:32 (``{'graph':
                       CausalModuleGraph}``). These pickle *live pyro
                       objects*; they are ingested WITHOUT pyro via
                       auto-fabricated stub classes (any ``pyro.*`` class
                       the pickle names resolves to a stub that captures
                       the pickled instance state), then the captured
                       tensors are mapped onto ``flows/bijectors.py``
                       params: pyro BatchNorm -> BatchNormFlow
                       (log_gamma = log(relu(gamma)+1e-6), pyro's
                       constrained_gamma), conditional_affine_autoregressive
                       -> ConditionalAffineT (masked MaskedLinear weights
                       collapsed to the context MLP — for input_dim=1 the
                       autoregressive mask leaves outputs context-only),
                       pyro Spline(order='linear') -> LinearRationalSplineT
                       (order='quadratic' -> SplineT), AffineTransform
                       bounds -> AffineT, Categorical -> empirical logits.

Weight-layout translations:

- Conv2d            torch (O, I, kH, kW)        -> HWIO
- ConvTranspose2d   torch (I, O, kH, kW)        -> HWIO rotated 180deg
  (torch's transposed conv correlates the dilated input with the kernel
  rotated by 180; this framework's transposed conv does not flip, so the
  flip is baked into the converted weights — the functions then match
  exactly)
- Linear            torch (O, I)                -> (I, O)
- Embedding         unchanged
- BatchNorm2d       weight/bias -> scale/bias; running stats -> batch_stats
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

# runnable as `python tools/convert_reference_checkpoint.py` from anywhere
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

DEFAULT_REFERENCE_PATH = "/root/reference"


def conv_w(t):  # (O, I, kH, kW) -> (kH, kW, I, O)
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def convT_w(t):  # (I, O, kH, kW) -> rot180 -> (kH, kW, I, O)
    w = np.asarray(t)[:, :, ::-1, ::-1]
    return np.transpose(w, (2, 3, 0, 1))


def linear_w(t):  # (O, I) -> (I, O)
    return np.transpose(np.asarray(t), (1, 0))


def map_plan_params(plan, sd: Dict[str, np.ndarray], prefix: str,
                    input_hw: Optional[Tuple[int, int]] = None):
    """Walk a PlanSequential plan against a torch nn.Sequential state dict,
    consuming sequential indices in order. Returns (params, batch_stats).

    ``input_hw``: when given, spatial shape is tracked through the plan so
    a dense layer following a flatten of a >1x1 feature map gets its input
    rows permuted from torch's (C, H, W)-major flatten order to this
    framework's (H, W, C)-major order."""
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, Dict[str, np.ndarray]] = {}
    seq_i = 0
    conv_i = bn_i = dense_i = 0
    plan = tuple(plan)
    hw = tuple(input_hw) if input_hw is not None else None
    flat_perm_shape: Optional[Tuple[int, int, int]] = None  # (H, W, C) at flatten

    def take(name):
        key = f"{prefix}.{seq_i}.{name}"
        if key not in sd:
            raise KeyError(f"missing {key}; have e.g. {list(sd)[:5]}")
        return np.asarray(sd[key])

    def _dense_perm(op_idx, n_out):
        """torch reshapes a dense stem with Unflatten(1, (C, H, W))
        (channel-first); this framework reshapes to (H, W, C). When a
        dense op feeds a reshape, permute its output columns so the two
        layouts agree element-for-element."""
        if op_idx + 1 < len(plan) and plan[op_idx + 1][0] == "reshape":
            h, w, c = plan[op_idx + 1][1]
            if h * w * c == n_out and (h, w) != (1, 1):
                idx = np.arange(n_out).reshape(c, h, w)  # torch (C,H,W) order
                return np.transpose(idx, (1, 2, 0)).reshape(-1)  # -> (H,W,C)
        return None

    for op_idx, op in enumerate(plan):
        kind = op[0]
        if kind == "conv":
            w = conv_w(take("weight"))
            params[f"conv_{conv_i}_kernel"] = w
            params[f"conv_{conv_i}_bias"] = take("bias")
            if hw is not None:
                k, s, p = op[2], op[3], op[4]
                hw = tuple((d + 2 * p - k) // s + 1 for d in hw)
            conv_i += 1
            seq_i += 1
        elif kind == "convT":
            w = convT_w(take("weight"))
            params[f"convT_{conv_i}_kernel"] = w
            params[f"convT_{conv_i}_bias"] = take("bias")
            if hw is not None:
                k, s, p = op[2], op[3], op[4]
                op_pad = op[5] if len(op) > 5 else 0
                hw = tuple((d - 1) * s - 2 * p + k + op_pad for d in hw)
            conv_i += 1
            seq_i += 1
        elif kind == "dense":
            w = linear_w(take("weight"))
            b = take("bias")
            if flat_perm_shape is not None:
                h, wd, c = flat_perm_shape
                idx = np.arange(h * wd * c).reshape(c, h, wd)  # torch (C,H,W)
                row_perm = np.transpose(idx, (1, 2, 0)).reshape(-1)
                w = w[row_perm, :]
                flat_perm_shape = None
            perm = _dense_perm(op_idx, w.shape[1])
            if perm is not None:
                w, b = w[:, perm], b[perm]
            params[f"dense_{dense_i}_kernel"] = w
            params[f"dense_{dense_i}_bias"] = b
            if hw is not None:
                hw = (1, 1)
            dense_i += 1
            seq_i += 1
        elif kind == "bn":
            params[f"bn_{bn_i}"] = {
                "scale": take("weight"),
                "bias": take("bias"),
            }
            stats[f"bn_{bn_i}"] = {
                "mean": take("running_mean"),
                "var": take("running_var"),
            }
            bn_i += 1
            seq_i += 1
        elif kind in ("lrelu", "tanh", "sigmoid", "drop", "drop2d"):
            seq_i += 1  # parameterless torch module occupies an index
        elif kind == "flatten":
            if hw is not None and hw != (1, 1):
                # channel count = most recent conv's output channels
                convs = [o for o in plan[:op_idx] if o[0] in ("conv", "convT")]
                if convs:
                    flat_perm_shape = (hw[0], hw[1], convs[-1][1])
            seq_i += 1
        elif kind == "reshape":
            if hw is not None:
                hw = tuple(op[1][:2])
            seq_i += 1
        else:
            raise ValueError(kind)
    return params, stats


# ------------------------------------------------------------------ loading


class _PyroStub:
    """Instance-state sponge for unpickling pyro objects without pyro.

    Default unpickling (``cls.__new__`` + ``__setstate__``/dict update)
    captures the pickled ``__dict__`` verbatim — for ``nn.Module``
    subclasses that includes ``_parameters``/``_buffers``/``_modules``,
    which is everything the attribute-SCM converter needs. Attribute
    access falls through to those torch-module dicts so extraction code
    can write ``stub.nn.layers`` like it would on a live module."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        if isinstance(state, tuple):  # (__dict__, __slots__) protocol
            for part in state:
                if part:
                    self.__dict__.update(part)
        elif isinstance(state, dict):
            self.__dict__.update(state)

    def __getattr__(self, name):
        d = self.__dict__
        for container in ("_parameters", "_buffers", "_modules"):
            c = d.get(container)
            if c is not None and name in c:
                return c[name]
        raise AttributeError(name)


class _StubModule(__import__("types").ModuleType):
    """Module whose unknown attributes resolve to fresh ``_PyroStub``
    subclasses — lets ``pickle.find_class`` resolve *any* pyro class path
    named by a legacy checkpoint."""

    def __init__(self, name):
        super().__init__(name)
        self.__path__ = []  # act as a package so submodule imports recurse

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        cls = type(name, (_PyroStub,), {"__module__": self.__name__})
        setattr(self, name, cls)
        return cls


class _CondTransformedDist:
    """Functional stand-in for pyro's ConditionalTransformedDistribution,
    backed by torch.distributions: enough for the reference VAEs' elbo
    (``/root/reference/deepscm_vae/mnist.py:121-133`` calls
    ``self.dist.condition((z, c)).log_prob(x)``), so the reference VAE
    training/eval code runs verbatim under these shims. Module-level so
    reference checkpoints holding one (MorphoMNISTVAE pickles ``.dist``)
    can round-trip through torch.save/load."""

    def __init__(self, base_dist, transforms):
        self.base_dist = base_dist
        self.transforms = list(transforms)

    def condition(self, context):
        import torch

        return torch.distributions.TransformedDistribution(
            self.base_dist,
            [t.condition(context) for t in self.transforms])


class _PyroStubFinder:
    """sys.meta_path hook: any ``pyro[.sub.module]`` import materialises a
    ``_StubModule`` (checkpoints reference deep paths like
    ``pyro.distributions.transforms.spline``)."""

    def find_spec(self, fullname, path=None, target=None):
        import importlib.util

        if fullname == "pyro" or fullname.startswith("pyro."):
            return importlib.util.spec_from_loader(fullname, loader=self)
        return None

    def create_module(self, spec):
        return _StubModule(spec.name)

    def exec_module(self, module):
        pass


def _install_reference_shims(reference_path: str):
    """Make the reference package importable for whole-module unpickling:
    sys.path + stand-ins for deps absent from this image. pyro modules are
    auto-stubbing (`_StubModule`): known torch-compatible classes are
    preset, anything else a pickle names becomes a `_PyroStub` subclass
    that captures instance state."""
    import types

    import torch

    def shim(name, factory=types.ModuleType, **attrs):
        if name in sys.modules:
            m = sys.modules[name]
        else:
            m = factory(name)
            sys.modules[name] = m
        for k, v in attrs.items():
            if k not in m.__dict__:
                setattr(m, k, v)
        return m

    shim("pytorch_msssim", ssim=lambda *a, **k: torch.tensor(0.0))
    ta = shim("torchaudio")
    tat = shim("torchaudio.transforms", Spectrogram=object, GriffinLim=object)
    ta.transforms = tat
    shim("librosa", core=types.SimpleNamespace(resample=None), resample=None)
    if not any(isinstance(f, _PyroStubFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _PyroStubFinder())
    py = shim("pyro", factory=_StubModule)
    pyd = shim("pyro.distributions", factory=_StubModule,
               MultivariateNormal=torch.distributions.MultivariateNormal,
               Normal=torch.distributions.Normal)
    pydt = shim("pyro.distributions.transforms", factory=_StubModule,
                AffineTransform=torch.distributions.transforms.AffineTransform)
    pydc = shim("pyro.distributions.conditional", factory=_StubModule,
                ConditionalTransform=type("ConditionalTransform", (), {}),
                ConditionalTransformedDistribution=_CondTransformedDist)
    py.distributions = pyd
    pyd.transforms = pydt
    pyd.conditional = pydc
    pyd.ConditionalTransformedDistribution = pydc.ConditionalTransformedDistribution
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)


def load_torch_tar(path: str, reference_path: str = DEFAULT_REFERENCE_PATH):
    """Load a reference checkpoint. Tries the safe tensor-only path first;
    whole-module pickles (the reference's other convention) execute
    arbitrary code from the file, so that fallback warns loudly."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        pass
    print(
        f"WARNING: {path} is not a plain state-dict checkpoint; falling back "
        "to weights_only=False. Unpickling a whole-module checkpoint "
        "EXECUTES CODE from the file — only convert checkpoints you trust.",
        file=sys.stderr,
    )
    _install_reference_shims(reference_path)
    return torch.load(path, map_location="cpu", weights_only=False)


def _to_np(sd) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def state_dict_of(obj, key_module: str, key_sd: str):
    """Handle both reference conventions: whole module or *_state_dict."""
    if key_sd in obj:
        return _to_np(obj[key_sd])
    if key_module in obj:
        return _to_np(obj[key_module].state_dict())
    raise KeyError(f"neither {key_module} nor {key_sd} in checkpoint: {list(obj)}")


# ------------------------------------------------------------------ BiGANs

# per-family torch key for each embedded attribute:
#   (E/D convention, G convention) — f(attr) -> state-dict key prefix
def _embed_keys_mnist(attr):
    return "digit_embedding.0.weight", "digit_embedding.weight"


def _embed_keys_moduledict(attr):
    return f"embedding_dict.{attr}.0.weight", f"embedding_dict.{attr}.weight"


def _embed_keys_esrf(attr):
    return "has_boat_embedding.0.weight", "has_boat_embedding.weight"


def convert_bigan_tree(cfg, sd_E, sd_G, sd_D, embed_keys):
    """Map reference E/G/D state dicts onto this framework's BiGAN params.
    Returns (params_E, params_G, vars_D)."""
    cat_names = [a.name for a in cfg.attr_spec.categorical]

    def chans_params(sd):
        return {
            f"embed_{a}": {"embedding": np.asarray(sd[embed_keys(a)[0]])}
            for a in cat_names
        }

    trunk_E, _ = map_plan_params(cfg.enc_plan, sd_E, "layers")
    params_E = {"trunk": trunk_E, "attr_channels": chans_params(sd_E)}

    trunk_G, _ = map_plan_params(cfg.gen_plan, sd_G, "layers")
    params_G = {
        "trunk": trunk_G,
        "attr_vectors": {
            f"embed_{a}": np.asarray(sd_G[embed_keys(a)[1]]) for a in cat_names
        },
    }

    dx_params, dx_stats = map_plan_params(cfg.dx_plan, sd_D, "dx")
    dz_params, _ = map_plan_params(cfg.dz_plan, sd_D, "dz")
    dxz_params, _ = map_plan_params(cfg.dxz_plan, sd_D, "dxz")
    params_D = {
        "dx": dx_params,
        "dz": dz_params,
        "dxz": dxz_params,
        "attr_channels": chans_params(sd_D),
    }
    vars_D = {"params": params_D, "batch_stats": {"dx": dx_stats}}
    return params_E, params_G, vars_D


def _fresh_bigan_state(cfg, params_E, params_G, vars_D):
    import jax

    from imagecfgen_tpu.models.bigan import BiGAN
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    trainer = GANTrainer(BiGAN(cfg), GANTrainConfig())
    state = trainer.init_state(jax.random.PRNGKey(0))
    return state.replace(
        params_E=params_E,
        params_G=params_G,
        vars_D={
            "params": vars_D["params"],
            "batch_stats": vars_D["batch_stats"] or state.vars_D["batch_stats"],
        },
    )


def convert_mnist_bigan(path_in: str, path_out: str, data_dir: str = "",
                        reference_path: str = DEFAULT_REFERENCE_PATH):
    import jax

    from imagecfgen_tpu.cli.common import save_bigan
    from imagecfgen_tpu.core.attributes import AttributeScaler, MNIST_SPEC
    from imagecfgen_tpu.models.bigan import mnist_bigan_config

    obj = load_torch_tar(path_in, reference_path)
    sd_E = state_dict_of(obj, "E", "E_state_dict")
    sd_G = state_dict_of(obj, "G", "G_state_dict")
    sd_D = state_dict_of(obj, "D", "D_state_dict")
    cfg = mnist_bigan_config()
    params_E, params_G, vars_D = convert_bigan_tree(
        cfg, sd_E, sd_G, sd_D, _embed_keys_mnist
    )
    state = _fresh_bigan_state(cfg, params_E, params_G, vars_D)
    scaler_valid = bool(data_dir)
    if data_dir:
        from imagecfgen_tpu.data.mnist import load_mnist_arrays

        _, attrs = load_mnist_arrays(data_dir, "train")
        scaler = AttributeScaler.fit(MNIST_SPEC, attrs)
    else:
        scaler = AttributeScaler(MNIST_SPEC, {k: 0.0 for k in ("thickness", "intensity", "slant")},
                                 {k: 1.0 for k in ("thickness", "intensity", "slant")})
        print("warning: no --data-dir; scaler saved with identity-ish bounds "
              "— refit before use (checkpoint is marked scaler_valid=false)")
    save_bigan(path_out, jax.device_get(state), scaler,
               meta={"converted_from": path_in, "scaler_valid": scaler_valid})
    print(f"wrote {path_out}")


def _load_spect_stats(stats_prefix: str, image_size):
    """Reference stats convention: ``{prefix}_mean.npy`` / ``{prefix}_std.npy``
    per-frequency-row vectors (classifiers/audio_mnist.py:200-219)."""
    if stats_prefix:
        mean = np.load(stats_prefix + "_mean.npy")
        std = np.load(stats_prefix + "_std.npy")
        return mean, std, True
    h = image_size[0]
    return np.zeros((h, 1), np.float32), np.ones((h, 1), np.float32), False


def _convert_spect_bigan(kind: str, config_fn, embed_keys, path_in: str,
                         path_out: str, stats_prefix: str = "",
                         reference_path: str = DEFAULT_REFERENCE_PATH):
    import jax

    from imagecfgen_tpu.core.checkpoint import save_checkpoint

    obj = load_torch_tar(path_in, reference_path)
    sd_E = state_dict_of(obj, "E", "E_state_dict")
    sd_G = state_dict_of(obj, "G", "G_state_dict")
    sd_D = state_dict_of(obj, "D", "D_state_dict")
    # the reference constructors take a width arg (audio_mnist.py:174,
    # whalecalls.py:219, esrf_acoustic.py:90) — infer it from the first
    # encoder conv's out-channels so narrow checkpoints convert too
    d = int(np.asarray(sd_E["layers.0.weight"]).shape[0])
    try:
        cfg = config_fn(d=d)
    except TypeError:  # patched/partial config fns that pin their own width
        cfg = config_fn()
    params_E, params_G, vars_D = convert_bigan_tree(cfg, sd_E, sd_G, sd_D, embed_keys)
    state = _fresh_bigan_state(cfg, params_E, params_G, vars_D)
    mean, std, stats_valid = _load_spect_stats(stats_prefix, cfg.image_size)
    if not stats_valid:
        print("warning: no --stats-prefix; spectrogram stats saved as "
              "identity — recompute from data before eval "
              "(checkpoint is marked stats_valid=false)")
    state = jax.device_get(state)
    tree = {
        "params_E": state.params_E,
        "params_G": state.params_G,
        "vars_D": state.vars_D,
        "opt_eg": state.opt_eg,
        "opt_d": state.opt_d,
        "step": state.step,
        "spect_mean": np.asarray(mean),
        "spect_std": np.asarray(std),
    }
    save_checkpoint(path_out, tree, meta={
        "kind": kind, "converted_from": path_in, "stats_valid": stats_valid,
        "d": d,
    })
    print(f"wrote {path_out}")


def convert_audio_bigan(path_in, path_out, stats_prefix="", reference_path=DEFAULT_REFERENCE_PATH):
    from imagecfgen_tpu.models.bigan import audio_mnist_bigan_config

    _convert_spect_bigan("bigan-audio-mnist", audio_mnist_bigan_config,
                         _embed_keys_moduledict, path_in, path_out,
                         stats_prefix, reference_path)


def convert_whale_bigan(path_in, path_out, stats_prefix="", reference_path=DEFAULT_REFERENCE_PATH):
    from imagecfgen_tpu.models.bigan import whale_bigan_config

    _convert_spect_bigan("bigan-whale", whale_bigan_config,
                         _embed_keys_moduledict, path_in, path_out,
                         stats_prefix, reference_path)


def convert_esrf_bigan(path_in, path_out, stats_prefix="", reference_path=DEFAULT_REFERENCE_PATH):
    from imagecfgen_tpu.models.bigan import esrf_bigan_config

    _convert_spect_bigan("bigan-esrf", esrf_bigan_config,
                         _embed_keys_esrf, path_in, path_out,
                         stats_prefix, reference_path)


# ------------------------------------------------------------------ VAEs

# (config fn path, mean/log-var torch attr names, embed key fn)
_VAE_FAMILIES = {
    "mnist-vae": ("mnist", ("mean_linear", "log_var_linear"), _embed_keys_mnist),
    "audio-vae": ("audio", ("mean", "log_var"), _embed_keys_moduledict),
    "whale-vae": ("whale", ("mean_linear", "log_var_linear"), _embed_keys_moduledict),
}


def convert_vae(kind: str, path_in: str, path_out: str,
                reference_path: str = DEFAULT_REFERENCE_PATH,
                data_dir: str = ""):
    """Map a reference VAE onto {"params": {"encoder", "decoder"}}.

    Accepts either ``{'vae_state_dict': vae.state_dict()}`` (safe; keys are
    ``encoder.*`` / ``decoder.*``) or the reference's whole-module
    ``{'vae': module}`` (runs under the pyro shims; see module docstring).
    The mnist kind also stores the attribute scaler our score scripts read
    (``mnist_vae_score.py`` loads ``tree["scaler"]``) — fitted from
    ``data_dir`` like the BiGAN converter, identity bounds otherwise."""
    from imagecfgen_tpu.core.checkpoint import save_checkpoint
    from imagecfgen_tpu.models import vae as vae_mod

    family, (mean_name, lv_name), embed_keys = _VAE_FAMILIES[kind]
    cfg = {
        "mnist": vae_mod.mnist_vae_config,
        "audio": vae_mod.audio_mnist_vae_config,
        "whale": vae_mod.whale_vae_config,
    }[family]()

    obj = load_torch_tar(path_in, reference_path)
    if "vae_state_dict" in obj:
        sd = _to_np(obj["vae_state_dict"])
    elif "vae" in obj:
        sd = _to_np(obj["vae"].state_dict())
    else:
        raise KeyError(f"neither vae nor vae_state_dict in checkpoint: {list(obj)}")

    enc = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    dec = {k[len("decoder."):]: v for k, v in sd.items() if k.startswith("decoder.")}
    cat_names = [a.name for a in cfg.attr_spec.categorical]

    trunk_E, _ = map_plan_params(cfg.enc_plan + cfg.vae_trunk_tail, enc, "layers")
    params_enc = {
        "trunk": trunk_E,
        "attr_channels": {
            f"embed_{a}": {"embedding": np.asarray(enc[embed_keys(a)[0]])}
            for a in cat_names
        },
        "mean_head": {
            "conv_0_kernel": conv_w(enc[f"{mean_name}.weight"]),
            "conv_0_bias": np.asarray(enc[f"{mean_name}.bias"]),
        },
        "log_var_head": {
            "conv_0_kernel": conv_w(enc[f"{lv_name}.weight"]),
            "conv_0_bias": np.asarray(enc[f"{lv_name}.bias"]),
        },
    }
    trunk_D, _ = map_plan_params(cfg.gen_plan, dec, "layers")
    params_dec = {
        "trunk": trunk_D,
        "attr_vectors": {
            f"embed_{a}": np.asarray(dec[embed_keys(a)[1]]) for a in cat_names
        },
    }
    tree = {"params": {"encoder": params_enc, "decoder": params_dec}}
    meta = {"kind": f"vae-{family}", "converted_from": path_in}
    if family == "mnist":
        from imagecfgen_tpu.core.attributes import MNIST_SPEC, AttributeScaler

        meta["scaler_valid"] = bool(data_dir)
        if data_dir:
            from imagecfgen_tpu.data.mnist import load_mnist_arrays

            _, attrs = load_mnist_arrays(data_dir, "train")
            scaler = AttributeScaler.fit(MNIST_SPEC, attrs)
        else:
            cont = ("thickness", "intensity", "slant")
            scaler = AttributeScaler(MNIST_SPEC, {k: 0.0 for k in cont},
                                     {k: 1.0 for k in cont})
            print("warning: no --data-dir; scaler saved with identity-ish "
                  "bounds — refit before use (scaler_valid=false)")
        tree["scaler"] = scaler.state_dict()
    save_checkpoint(path_out, tree, meta=meta)
    print(f"wrote {path_out}")


# ------------------------------------------------------------------ classifiers


def _seq_state_dict(obj, keys: Tuple[str, ...]):
    """Reference classifiers are bare nn.Sequential saved under one of
    several dict keys; state-dict keys are then '0.weight' etc."""
    for k in keys:
        if k in obj:
            v = obj[k]
            sd = _to_np(v if isinstance(v, dict) else v.state_dict())
            return {f"seq.{kk}": vv for kk, vv in sd.items()}
    raise KeyError(f"none of {keys} in checkpoint: {list(obj)}")


def _convert_seq_classifier(cfg, kind: str, obj_keys, path_in, path_out,
                            extra_tree=None, extra_meta=None,
                            reference_path=DEFAULT_REFERENCE_PATH):
    from imagecfgen_tpu.core.checkpoint import save_checkpoint

    obj = load_torch_tar(path_in, reference_path)
    sd = _seq_state_dict(obj, obj_keys)
    params, _ = map_plan_params(cfg.plan, sd, "seq", input_hw=cfg.image_size)
    tree = {"params": {"trunk": params}, **(extra_tree or {})}
    save_checkpoint(path_out, tree,
                    meta={"kind": kind, "converted_from": path_in,
                          **(extra_meta or {})})
    print(f"wrote {path_out}")


def convert_mnist_clf(path_in, path_out, reference_path=DEFAULT_REFERENCE_PATH):
    from imagecfgen_tpu.models.classifier import mnist_classifier_config

    _convert_seq_classifier(mnist_classifier_config(), "mnist-clf",
                            ("clf", "model", "clf_state_dict"),
                            path_in, path_out, reference_path=reference_path)


def convert_mnist_oracle(path_in, path_out, reference_path=DEFAULT_REFERENCE_PATH):
    from imagecfgen_tpu.models.classifier import mnist_oracle_config

    _convert_seq_classifier(mnist_oracle_config(), "mnist-oracle",
                            ("oracle", "model", "clf"),
                            path_in, path_out, reference_path=reference_path)


def convert_audio_clf(path_in, path_out, attribute="digit", stats_prefix="",
                      reference_path=DEFAULT_REFERENCE_PATH):
    from imagecfgen_tpu.models.classifier import audio_mnist_classifier_config
    from imagecfgen_tpu.scm.audio_mnist import CARDINALITIES

    n_classes = 60 if attribute == "subject" else CARDINALITIES[attribute]
    mean, std, stats_valid = _load_spect_stats(stats_prefix, (128, 128))
    if not stats_valid:
        print("warning: no --stats-prefix; spectrogram stats saved as identity "
              "(stats_valid=false)")
    _convert_seq_classifier(
        audio_mnist_classifier_config(num_classes=n_classes), "audio-mnist-clf",
        ("model", "clf"), path_in, path_out,
        extra_tree={"spect_mean": mean, "spect_std": std},
        extra_meta={"attribute": attribute, "n_classes": n_classes,
                    "width": 1.0, "stats_valid": stats_valid},
        reference_path=reference_path,
    )


def convert_whale_clf(path_in, path_out, stats_prefix="",
                      reference_path=DEFAULT_REFERENCE_PATH):
    from imagecfgen_tpu.models.classifier import narw_classifier_config

    mean, std, stats_valid = _load_spect_stats(stats_prefix, (256, 256))
    if not stats_valid:
        print("warning: no --stats-prefix; spectrogram stats saved as identity "
              "(stats_valid=false)")
    _convert_seq_classifier(
        narw_classifier_config(), "whale-clf", ("clf", "model"),
        path_in, path_out,
        extra_tree={"spect_mean": mean, "spect_std": std},
        extra_meta={"width": 1.0, "stats_valid": stats_valid},
        reference_path=reference_path,
    )


def _stub_tensors(stub) -> Dict[str, np.ndarray]:
    """All parameter/buffer tensors captured on an unpickled module stub."""
    out = {}
    for container in ("_parameters", "_buffers"):
        for k, v in (getattr(stub, container, None) or {}).items():
            if v is not None:
                out[k] = np.asarray(
                    v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                    np.float32,
                )
    return out


def _masked_linear_eff(layer) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """(effective weight (O,I), bias (O,), mask or None) of a pyro
    MaskedLinear stub — the mask multiplies the weight at forward time
    (pyro.nn.auto_reg_nn), so the effective weight is ``weight * mask``."""
    t = _stub_tensors(layer)
    w = t["weight"]
    mask = t.get("mask")
    if mask is not None:
        w = w * mask
    return w, t.get("bias", np.zeros(w.shape[0], np.float32)), mask


def _convert_cond_affine(caa) -> Tuple[list, Tuple[int, ...], Tuple[float, float]]:
    """pyro ConditionalAffineAutoregressive (input_dim=1) -> ConditionalAffineT
    mlp params. The hypernet is a ConditionalAutoRegressiveNN over
    cat([context, x]); for input_dim=1 the autoregressive mask zeroes every
    x column, so the net is exactly MLP(context) -> (loc, log_scale). The
    context columns are identified from the stored first-layer mask (any
    nonzero entry), not assumed."""
    net = caa.nn
    layer_list = getattr(net, "layers", None)
    if layer_list is None:
        raise SystemExit("conditional affine hypernet has no layers")
    if hasattr(layer_list, "_modules"):  # nn.ModuleList (real or stub)
        layers = list(layer_list._modules.values())
    else:
        layers = list(layer_list)
    mlp = []
    for i, layer in enumerate(layers):
        w, b, mask = _masked_linear_eff(layer)
        if i == 0:
            if mask is None:
                raise SystemExit("first hypernet layer has no mask buffer")
            ctx_cols = np.where(mask.any(axis=0))[0]
            dead = np.setdiff1d(np.arange(w.shape[1]), ctx_cols)
            assert np.abs(w[:, dead]).max() == 0.0, (
                "masked x-columns of the first layer must be zero")
            w = w[:, ctx_cols]
        mlp.append({"w": w.T, "b": b})  # torch (O,I) -> ours (I,O)
    hidden = tuple(layer["w"].shape[1] for layer in mlp[:-1])
    clip = (float(getattr(caa, "log_scale_min_clip", -5.0)),
            float(getattr(caa, "log_scale_max_clip", 3.0)))
    assert mlp[-1]["w"].shape[1] == 2, "expected (loc, log_scale) output pair"
    return mlp, hidden, clip


def convert_attribute_scm(path_in, path_out,
                          reference_path=DEFAULT_REFERENCE_PATH, **_):
    """Ingest the reference's pyro-pickled MNIST attribute SCM
    (``train_mnist_attribute_scm.py:32``) without pyro: every pyro class
    in the pickle resolves to a state-capturing stub, and the captured
    tensors are mapped onto this framework's flow parameters."""
    import jax

    from imagecfgen_tpu.cli.common import save_attribute_scm
    from imagecfgen_tpu.scm.mnist import MNISTAttributeSCM, build_mnist_graph
    from imagecfgen_tpu.scm.module import CategoricalCM

    obj = load_torch_tar(path_in, reference_path)
    graph = obj["graph"] if isinstance(obj, dict) and "graph" in obj else obj

    mods = graph.modules
    expected = {"thickness", "intensity", "slant", "digit"}
    if set(mods) != expected:
        raise SystemExit(f"unexpected SCM nodes {sorted(mods)} (want {sorted(expected)})")
    edges = {(u, v) for u, vs in graph.adj.items() for v in vs}
    if edges != {("thickness", "intensity")}:
        raise SystemExit(f"unexpected SCM edges {sorted(edges)}")

    # ---- thickness: BatchNorm flow + Exp --------------------------------
    bn, _exp = list(mods["thickness"].td.transforms)
    bn_t = _stub_tensors(bn)
    if "gamma" in bn_t:  # pyro stores unconstrained gamma;
        # constrained_gamma = relu(gamma) + 1e-6 (pyro batchnorm.py)
        log_gamma = np.log(np.maximum(bn_t["gamma"], 0.0) + 1e-6)
    elif "log_gamma" in bn_t:
        log_gamma = bn_t["log_gamma"]
    else:
        raise SystemExit(f"unrecognised BatchNorm params {sorted(bn_t)}")
    p_thick = ({"log_gamma": log_gamma, "beta": bn_t["beta"]}, {})
    s_thick = ({"mean": bn_t["moving_mean"], "var": bn_t["moving_variance"]}, {})

    # ---- intensity | thickness: cond-affine + Sigmoid + Affine ----------
    caa, _sig, aff_i = list(mods["intensity"].ctd.transforms)
    mlp, cond_hidden, clip = _convert_cond_affine(caa)
    i_lo, i_rng = float(np.asarray(aff_i.loc)), float(np.asarray(aff_i.scale))
    p_int = ({"mlp": mlp}, {}, {})
    s_int = ({}, {}, {})

    # ---- slant: Spline + Affine -----------------------------------------
    sp, aff_s = list(mods["slant"].td.transforms)
    sp_t = _stub_tensors(sp)
    order = getattr(sp, "order", "linear")  # pyro Spline default order
    spline_kind = "linear" if order == "linear" else "rq"
    p_slant_spline = {
        "widths": sp_t["unnormalized_widths"],
        "heights": sp_t["unnormalized_heights"],
        "derivs": sp_t["unnormalized_derivatives"],
    }
    if spline_kind == "linear":
        p_slant_spline["lambdas"] = sp_t["unnormalized_lambdas"]
    s_lo, s_rng = float(np.asarray(aff_s.loc)), float(np.asarray(aff_s.scale))
    p_slant = (p_slant_spline, {})
    s_slant = ({}, {})

    # ---- digit: empirical categorical -----------------------------------
    d = mods["digit"].d
    if "probs" in d.__dict__ or hasattr(d, "probs"):
        probs = np.asarray(d.__dict__.get("probs", getattr(d, "probs", None)))
        logits = np.log(np.maximum(probs.astype(np.float64), 1e-12))
    else:
        logits = np.asarray(d.logits)
    p_digit = {"logits": np.asarray(logits, np.float32).reshape(-1)}
    n_digit = p_digit["logits"].shape[0]

    count_bins = p_slant_spline["widths"].shape[-1]
    bound = float(getattr(sp, "bound", 3.0))
    new_graph = build_mnist_graph(
        i_lo, i_lo + i_rng, s_lo, s_lo + s_rng,
        cond_hidden=cond_hidden, spline=spline_kind,
    )
    spline_bij = new_graph.modules["slant"].flow.chain.bijectors[0]
    assert spline_bij.count_bins == count_bins and spline_bij.bound == bound, (
        "non-default pyro Spline hyperparameters "
        f"(count_bins={count_bins}, bound={bound}) are not supported")
    cond_bij = new_graph.modules["intensity"].flow.chain.bijectors[0]
    assert cond_bij.log_scale_clip == clip, (
        f"non-default log-scale clip {clip} is not supported")
    assert n_digit == 10, n_digit

    params = {
        "thickness": jax.tree_util.tree_map(jnp_f32, p_thick),
        "intensity": jax.tree_util.tree_map(jnp_f32, p_int),
        "slant": jax.tree_util.tree_map(jnp_f32, p_slant),
        "digit": jax.tree_util.tree_map(jnp_f32, p_digit),
    }
    state = {
        "thickness": jax.tree_util.tree_map(jnp_f32, s_thick),
        "intensity": s_int,
        "slant": s_slant,
        "digit": {},
    }
    scm = MNISTAttributeSCM(new_graph, params, state)
    save_attribute_scm(path_out, scm)
    print(f"wrote {path_out} (attribute-scm: BatchNorm+Exp / "
          f"cond-affine{list(cond_hidden)} / {spline_kind}-spline K={count_bins} "
          f"/ Categorical({n_digit}))")


def jnp_f32(x):
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(x, np.float32))


KINDS = {
    "mnist-bigan": convert_mnist_bigan,
    "audio-bigan": convert_audio_bigan,
    "whale-bigan": convert_whale_bigan,
    "esrf-bigan": convert_esrf_bigan,
    "mnist-vae": lambda i, o, **kw: convert_vae("mnist-vae", i, o, **kw),
    "audio-vae": lambda i, o, **kw: convert_vae("audio-vae", i, o, **kw),
    "whale-vae": lambda i, o, **kw: convert_vae("whale-vae", i, o, **kw),
    "mnist-clf": convert_mnist_clf,
    "morphomnist-oracle": convert_mnist_oracle,
    "audio-clf": convert_audio_clf,
    "whale-clf": convert_whale_clf,
    "attribute-scm": convert_attribute_scm,
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=sorted(KINDS), required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--data-dir", default="",
                    help="(mnist-bigan) training npy dir to refit the attribute scaler")
    ap.add_argument("--stats-prefix", default="",
                    help="(spectrogram kinds) path prefix of {prefix}_mean.npy/"
                         "{prefix}_std.npy per-row spectrogram stats")
    ap.add_argument("--attribute", default="digit",
                    help="(audio-clf) target attribute (or 'subject')")
    ap.add_argument("--reference-path", default=DEFAULT_REFERENCE_PATH,
                    help="reference sources for whole-module unpickling")
    args = ap.parse_args()
    kw = {"reference_path": args.reference_path}
    if args.kind in ("mnist-bigan", "mnist-vae"):
        kw["data_dir"] = args.data_dir
    if args.kind in ("audio-bigan", "whale-bigan", "esrf-bigan",
                     "audio-clf", "whale-clf"):
        kw["stats_prefix"] = args.stats_prefix
    if args.kind == "audio-clf":
        kw["attribute"] = args.attribute
    KINDS[args.kind](args.input, args.output, **kw)
