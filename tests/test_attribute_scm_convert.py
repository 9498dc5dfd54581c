"""Pyro-free ingestion of the legacy attribute-SCM checkpoint (VERDICT r2
item 4).

The reference ships the MNIST attribute SCM as a pickled *live* pyro
object graph (``train_mnist_attribute_scm.py:32``); this environment has
no pyro. The converter resolves every pyro class named by the pickle to a
state-capturing stub and maps the captured tensors onto
``flows/bijectors.py`` params.

Test protocol (no pyro exists to author a fixture either, so the fixture
is built to pyro's published pickle layout): fit this framework's SCM in
the pyro-architecture configuration (cond_hidden=(10,), linear-rational
spline), *export* its parameters into a torch checkpoint whose classes
carry the real pyro module paths and attribute names
(gamma = constrained-inverse, MaskedLinear weight+mask with junk in the
masked x-column, unnormalized_* spline tensors, probs), run the converter
CLI on it, and assert the round-tripped SCM reproduces the original's
``log_prob`` and ``sample_cf`` exactly. This validates every mapping rule
(mask application, transposes, constraint inverses, tuple layouts) even
though it cannot certify pyro's own attribute spellings, which are
transcribed from pyro source and documented in the converter.
"""
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("IMAGECFGEN_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference sources unavailable"
)


def _fit_small_scm():
    from imagecfgen_tpu.scm.mnist import MNISTAttributeSCM

    rng = np.random.default_rng(0)
    n = 4096
    t = rng.gamma(10, 1 / 5, n).astype(np.float32) + 0.5
    i = (191 / (1 + np.exp(-(0.5 * rng.normal(size=n) + 2 * t - 5))) + 64).astype(
        np.float32
    )
    s = (np.pi * rng.normal(0, 0.1, n)).astype(np.float32)
    digit = rng.integers(0, 10, n)
    scm = MNISTAttributeSCM.fit(
        {"thickness": t, "intensity": i, "slant": s, "digit": digit},
        steps=40, batch_size=n, cond_hidden=(10,), spline="linear",
    )
    return scm, {"thickness": t, "intensity": i, "slant": s, "digit": digit}


def _export_legacy_checkpoint(scm, path):
    """Write a torch .tar that mimics the reference's pyro pickle layout."""
    import torch
    from torch import nn

    from tools.convert_reference_checkpoint import _install_reference_shims

    _install_reference_shims(REFERENCE)
    from attribute_scms.causal_module import (  # noqa: E402
        CategoricalCM, ConditionalTransformedCM, TransformedCM)
    from attribute_scms.graph import CausalModuleGraph  # noqa: E402

    def pyro_class(module_path, name, bases=(object,), ns=None):
        """A class registered at the exact pyro path pickle will record."""
        cls = type(name, bases, dict(ns or {}, __module__=module_path))
        setattr(sys.modules[module_path], name, cls)
        return cls

    # make sure the deep stub modules exist (the finder serves them)
    for m in ("pyro.distributions.torch",
              "pyro.distributions.transforms.batchnorm",
              "pyro.distributions.transforms.affine_autoregressive",
              "pyro.distributions.transforms.spline",
              "pyro.nn.auto_reg_nn"):
        __import__(m)

    P = scm.params
    S = scm.state

    # ---- thickness: pyro BatchNorm (gamma stored unconstrained) ---------
    BatchNorm = pyro_class(
        "pyro.distributions.transforms.batchnorm", "BatchNorm", (nn.Module,)
    )
    bn = BatchNorm()
    nn.Module.__init__(bn)
    log_gamma = np.asarray(P["thickness"][0]["log_gamma"])
    bn.gamma = nn.Parameter(torch.tensor(np.exp(log_gamma) - 1e-6))
    bn.beta = nn.Parameter(torch.tensor(np.asarray(P["thickness"][0]["beta"])))
    bn.register_buffer("moving_mean",
                       torch.tensor(np.asarray(S["thickness"][0]["mean"])))
    bn.register_buffer("moving_variance",
                       torch.tensor(np.asarray(S["thickness"][0]["var"])))
    bn.momentum, bn.epsilon = 0.1, 1e-5

    TransformedDistribution = pyro_class(
        "pyro.distributions.torch", "TransformedDistribution"
    )
    t_td = TransformedDistribution()
    t_td.base_dist = torch.distributions.Normal(torch.zeros(1), torch.ones(1))
    t_td.transforms = [bn, torch.distributions.transforms.ExpTransform()]

    # ---- intensity: ConditionalAffineAutoregressive over MaskedLinears --
    MaskedLinear = pyro_class("pyro.nn.auto_reg_nn", "MaskedLinear", (nn.Linear,))
    CondARNN = pyro_class(
        "pyro.nn.auto_reg_nn", "ConditionalAutoRegressiveNN", (nn.Module,)
    )
    CondAffine = pyro_class(
        "pyro.distributions.transforms.affine_autoregressive",
        "ConditionalAffineAutoregressive", (nn.Module,),
    )
    mlp = P["intensity"][0]["mlp"]
    w1 = np.asarray(mlp[0]["w"])  # (1, 10) ours (I, O)
    w2 = np.asarray(mlp[1]["w"])  # (10, 2)
    l1 = MaskedLinear(2, w1.shape[1])
    with torch.no_grad():
        # cat([context, x]) ordering: column 0 = context, column 1 = x.
        # The x column holds JUNK under a zero mask — the converter must
        # honour the mask, as pyro's forward does.
        l1.weight[:, 0] = torch.tensor(w1[0])
        l1.weight[:, 1] = 999.0
        l1.bias.copy_(torch.tensor(np.asarray(mlp[0]["b"])))
    l1.register_buffer(
        "mask", torch.cat([torch.ones(w1.shape[1], 1),
                           torch.zeros(w1.shape[1], 1)], dim=1))
    l2 = MaskedLinear(w1.shape[1], 2)
    with torch.no_grad():
        l2.weight.copy_(torch.tensor(w2.T))
        l2.bias.copy_(torch.tensor(np.asarray(mlp[1]["b"])))
    l2.register_buffer("mask", torch.ones(2, w1.shape[1]))
    arn = CondARNN()
    nn.Module.__init__(arn)
    arn.layers = nn.ModuleList([l1, l2])
    caa = CondAffine()
    nn.Module.__init__(caa)
    caa.nn = arn
    caa.log_scale_min_clip, caa.log_scale_max_clip = -5.0, 3.0

    i_bij = scm.graph.modules["intensity"].flow.chain.bijectors[2]
    ConditionalTransformedDistribution = pyro_class(
        "pyro.distributions.conditional", "ConditionalTransformedDistribution"
    )
    i_ctd = ConditionalTransformedDistribution()
    i_ctd.base_dist = torch.distributions.Normal(torch.zeros(1), torch.ones(1))
    i_ctd.transforms = [
        caa,
        torch.distributions.transforms.SigmoidTransform(),
        torch.distributions.transforms.AffineTransform(
            torch.tensor(i_bij.loc), torch.tensor(i_bij.scale)),
    ]

    # ---- slant: pyro Spline(order="linear") -----------------------------
    Spline = pyro_class(
        "pyro.distributions.transforms.spline", "Spline", (nn.Module,)
    )
    sp = Spline()
    nn.Module.__init__(sp)
    spp = P["slant"][0]
    sp.unnormalized_widths = nn.Parameter(torch.tensor(np.asarray(spp["widths"])))
    sp.unnormalized_heights = nn.Parameter(torch.tensor(np.asarray(spp["heights"])))
    sp.unnormalized_derivatives = nn.Parameter(
        torch.tensor(np.asarray(spp["derivs"])))
    sp.unnormalized_lambdas = nn.Parameter(torch.tensor(np.asarray(spp["lambdas"])))
    sp.order, sp.bound, sp.count_bins = "linear", 3.0, spp["widths"].shape[-1]
    s_bij = scm.graph.modules["slant"].flow.chain.bijectors[1]
    s_td = TransformedDistribution()
    s_td.base_dist = torch.distributions.Normal(torch.zeros(1), torch.ones(1))
    s_td.transforms = [
        sp,
        torch.distributions.transforms.AffineTransform(
            torch.tensor(s_bij.loc), torch.tensor(s_bij.scale)),
    ]

    # ---- digit: pyro Categorical(probs) ---------------------------------
    Categorical = pyro_class("pyro.distributions.torch", "Categorical")
    cat = Categorical()
    cat.probs = torch.tensor(
        np.exp(np.asarray(P["digit"]["logits"], np.float64)))

    graph = CausalModuleGraph()
    graph.add_module("thickness", TransformedCM(t_td))
    graph.add_module("intensity", ConditionalTransformedCM(i_ctd))
    graph.add_module("slant", TransformedCM(s_td))
    graph.add_module("digit", CategoricalCM.__new__(CategoricalCM))
    nn.Module.__init__(graph.modules["digit"])
    graph.modules["digit"].d = cat
    graph.add_edge("thickness", "intensity")
    torch.save({"graph": graph}, path)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    scm, attrs = _fit_small_scm()
    d = tmp_path_factory.mktemp("attr_scm")
    legacy = str(d / "mnist-attribute-scm.tar")
    out = str(d / "converted-attribute-scm.tar")
    _export_legacy_checkpoint(scm, legacy)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_reference_checkpoint.py"),
         "--kind", "attribute-scm", "--input", legacy, "--output", out],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={**os.environ, "IMAGECFGEN_PLATFORM": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    from imagecfgen_tpu.cli.common import load_attribute_scm

    return scm, load_attribute_scm(out), attrs


def test_log_prob_parity(converted):
    scm, conv, attrs = converted
    obs = {
        "thickness": attrs["thickness"][:512].reshape(-1, 1),
        "intensity": attrs["intensity"][:512].reshape(-1, 1),
        "slant": attrs["slant"][:512].reshape(-1, 1),
    }
    lp_a = scm.log_prob(obs)
    lp_b = conv.log_prob(obs)
    for k in obs:
        a, b = np.asarray(lp_a[k]), np.asarray(lp_b[k])
        assert np.allclose(a, b, atol=1e-5), (k, np.abs(a - b).max())


def test_sample_cf_parity(converted):
    scm, conv, attrs = converted
    n = 256
    obs = {
        "thickness": attrs["thickness"][:n].reshape(-1, 1),
        "intensity": attrs["intensity"][:n].reshape(-1, 1),
        "slant": attrs["slant"][:n].reshape(-1, 1),
        "digit": attrs["digit"][:n].astype(np.int32),
    }
    iv = {"thickness": (attrs["thickness"][:n] + 2).reshape(-1, 1)}
    key = jax.random.PRNGKey(5)
    cf_a = scm.sample_cf(key, obs, iv)
    cf_b = conv.sample_cf(key, obs, iv)
    for k in cf_a:
        a, b = np.asarray(cf_a[k]), np.asarray(cf_b[k])
        assert np.allclose(a, b, atol=1e-5), (k, np.abs(a - b).max())
    # and the causal mechanism fires: thicker strokes brighten
    delta = np.asarray(cf_b["intensity"]).ravel() - obs["intensity"].ravel()
    assert delta.mean() > 5.0, delta.mean()
