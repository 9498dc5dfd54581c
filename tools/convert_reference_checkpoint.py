"""Convert reference PyTorch checkpoints (.tar) into imagecfgen_tpu format.

The reference saves two inconsistent conventions (whole pickled modules vs
state-dicts — SURVEY §5); this tool reads either via torch (CPU) and maps
the weights onto this framework's parameter trees so trained reference
models are drop-in usable:

    python tools/convert_reference_checkpoint.py \
        --kind mnist-bigan --input mnist-bigan.tar --output mnist-bigan.tar

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
import sys
from typing import Dict, List, Tuple

import numpy as np


def conv_w(t):  # (O, I, kH, kW) -> (kH, kW, I, O)
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def convT_w(t):  # (I, O, kH, kW) -> rot180 -> (kH, kW, I, O)
    w = np.asarray(t)[:, :, ::-1, ::-1]
    return np.transpose(w, (2, 3, 0, 1))


def linear_w(t):  # (O, I) -> (I, O)
    return np.transpose(np.asarray(t), (1, 0))


def map_plan_params(plan, sd: Dict[str, np.ndarray], prefix: str):
    """Walk a PlanSequential plan against a torch nn.Sequential state dict,
    consuming sequential indices in order. Returns (params, batch_stats)."""
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, Dict[str, np.ndarray]] = {}
    seq_i = 0
    conv_i = bn_i = dense_i = 0

    def take(name):
        key = f"{prefix}.{seq_i}.{name}"
        if key not in sd:
            raise KeyError(f"missing {key}; have e.g. {list(sd)[:5]}")
        return np.asarray(sd[key])

    for op in plan:
        kind = op[0]
        if kind == "conv":
            params[f"conv_{conv_i}_kernel"] = conv_w(take("weight"))
            params[f"conv_{conv_i}_bias"] = take("bias")
            conv_i += 1
            seq_i += 1
        elif kind == "convT":
            params[f"convT_{conv_i}_kernel"] = convT_w(take("weight"))
            params[f"convT_{conv_i}_bias"] = take("bias")
            conv_i += 1
            seq_i += 1
        elif kind == "dense":
            params[f"dense_{dense_i}_kernel"] = linear_w(take("weight"))
            params[f"dense_{dense_i}_bias"] = take("bias")
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
        elif kind in ("flatten", "reshape"):
            # torch uses Flatten()/Unflatten() modules inside Sequential
            seq_i += 1
        else:
            raise ValueError(kind)
    return params, stats


def load_torch_tar(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj


def state_dict_of(obj, key_module: str, key_sd: str):
    """Handle both reference conventions: whole module or *_state_dict."""
    if key_sd in obj:
        return {k: v.numpy() for k, v in obj[key_sd].items()}
    if key_module in obj:
        return {k: v.numpy() for k, v in obj[key_module].state_dict().items()}
    raise KeyError(f"neither {key_module} nor {key_sd} in checkpoint: {list(obj)}")


def convert_mnist_bigan(path_in: str, path_out: str, data_dir: str = ""):
    import jax

    from imagecfgen_tpu.cli.common import save_bigan
    from imagecfgen_tpu.core.attributes import AttributeScaler, MNIST_SPEC
    from imagecfgen_tpu.models.bigan import BiGAN, mnist_bigan_config
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    obj = load_torch_tar(path_in)
    sd_E = state_dict_of(obj, "E", "E_state_dict")
    sd_G = state_dict_of(obj, "G", "G_state_dict")
    sd_D = state_dict_of(obj, "D", "D_state_dict")
    cfg = mnist_bigan_config()

    params_E, _ = map_plan_params(cfg.enc_plan, sd_E, "layers")
    params_E = {
        "trunk": params_E,
        "attr_channels": {
            "embed_digit": {"embedding": np.asarray(sd_E["digit_embedding.0.weight"])}
        },
    }
    params_G_trunk, _ = map_plan_params(cfg.gen_plan, sd_G, "layers")
    params_G = {
        "trunk": params_G_trunk,
        "attr_vectors": {"embed_digit": np.asarray(sd_G["digit_embedding.weight"])},
    }
    dx_params, dx_stats = map_plan_params(cfg.dx_plan, sd_D, "dx")
    dz_params, _ = map_plan_params(cfg.dz_plan, sd_D, "dz")
    dxz_params, _ = map_plan_params(cfg.dxz_plan, sd_D, "dxz")
    params_D = {
        "dx": dx_params,
        "dz": dz_params,
        "dxz": dxz_params,
        "attr_channels": {
            "embed_digit": {"embedding": np.asarray(sd_D["digit_embedding.0.weight"])}
        },
    }
    batch_stats_D = {"dx": dx_stats}

    # fresh optimizer state + scaler from the training data (if available)
    trainer = GANTrainer(BiGAN(cfg), GANTrainConfig())
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state.replace(
        params_E=params_E,
        params_G=params_G,
        vars_D={"params": params_D, "batch_stats": batch_stats_D},
    )
    if data_dir:
        from imagecfgen_tpu.data.mnist import load_mnist_arrays

        _, attrs = load_mnist_arrays(data_dir, "train")
        scaler = AttributeScaler.fit(MNIST_SPEC, attrs)
    else:
        scaler = AttributeScaler(MNIST_SPEC, {k: 0.0 for k in ("thickness", "intensity", "slant")},
                                 {k: 1.0 for k in ("thickness", "intensity", "slant")})
        print("warning: no --data-dir; scaler saved with identity-ish bounds "
              "— refit before use")
    save_bigan(path_out, jax.device_get(state), scaler,
               meta={"converted_from": path_in})
    print(f"wrote {path_out}")


def convert_mnist_clf(path_in: str, path_out: str):
    from imagecfgen_tpu.core.checkpoint import save_checkpoint
    from imagecfgen_tpu.models.classifier import mnist_classifier_config

    obj = load_torch_tar(path_in)
    key = "clf" if "clf" in obj else "model"
    sd = {k: v.numpy() for k, v in obj[key].state_dict().items()}
    cfg = mnist_classifier_config()
    # the torch classifier is a bare nn.Sequential: keys are "0.weight" etc.
    sd = {f"seq.{k}": v for k, v in sd.items()}
    params, _ = map_plan_params(cfg.plan, sd, "seq")
    save_checkpoint(path_out, {"params": {"trunk": params}},
                    meta={"kind": "mnist-clf", "converted_from": path_in})
    print(f"wrote {path_out}")


KINDS = {
    "mnist-bigan": convert_mnist_bigan,
    "mnist-clf": convert_mnist_clf,
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=sorted(KINDS), required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--data-dir", default="",
                    help="(mnist-bigan) training npy dir to refit the attribute scaler")
    args = ap.parse_args()
    if args.kind == "mnist-bigan":
        convert_mnist_bigan(args.input, args.output, args.data_dir)
    else:
        KINDS[args.kind](args.input, args.output)
