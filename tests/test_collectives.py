"""Compiled-HLO communication audit (VERDICT r2 weak item 3, r3 item 7).

The data-parallel story claims: params replicated, batch sharded, and
the ONLY cross-device traffic a gradient all-reduce. Rather than trust
the sharding annotations, compile the real train step over the 8-device
virtual mesh and read the collectives out of the HLO XLA actually
emitted (tools/collective_report.py): all-reduce bytes must match the
gradient bytes (EG + 2x D for the GAN trainers' two sequential D
updates; 1x params for the VAE's single optimizer), and no
all-gather/reduce-scatter/all-to-all may appear — a param all-gather
here is exactly the silent resharding regression this guards against.

Pinned for every family topology: MNIST 28^2, audio 128^2, whale 256^2,
ESRF 512^2 (BiGAN trainers at reduced width — the invariant is a
property of the program structure, not the channel count; the committed
full-width audit is docs/collectives_r04.jsonl) and the VAE trainer.
"""
import dataclasses

import numpy as np
import pytest

from tools.collective_report import (
    audit_family,
    audit_vae,
    collective_summary,
    tree_bytes,
)


def _assert_pure_dp(row):
    # grad all-reduce dominates; batch-norm stats + a few scalar metrics
    # ride along as noise (<2% at these widths). Upper bound 1.5 tolerates
    # XLA splitting one logical all-reduce into a few.
    assert 0.98 <= row["allreduce_over_expected"] <= 1.5, row
    for kind in ("all-gather", "reduce-scatter", "all-to-all"):
        assert row["collectives"][kind]["count"] == 0, row


@pytest.mark.parametrize("family,d", [
    ("audio", 4), ("whale", 4), ("esrf", 4),
])
def test_dp_program_is_pure_gradient_allreduce(family, d):
    row = audit_family(family, d=d)
    assert row["n_devices"] == 8
    _assert_pure_dp(row)


def test_mnist_dp_program_is_pure_gradient_allreduce():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagecfgen_tpu.models.bigan import BiGAN
    from imagecfgen_tpu.parallel.mesh import DATA_AXIS, data_mesh
    from imagecfgen_tpu.train.gan_trainer import GANTrainConfig, GANTrainer
    from tools.collective_report import _batch_avals
    from tools.dp_scaling import narrowed_config

    cfg = narrowed_config()
    mesh = data_mesh()
    assert len(mesh.devices.flatten()) == 8
    trainer = GANTrainer(BiGAN(cfg), GANTrainConfig(batch_size=16), mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))

    repl, bsh = NamedSharding(mesh, P()), NamedSharding(mesh, P(DATA_AXIS))
    state_avals = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype,
                                       sharding=repl), state)
    compiled = jax.jit(trainer.train_step).lower(
        state_avals, _batch_avals(cfg, 16, bsh)).compile()
    summary = collective_summary(compiled.as_text())

    expected = (tree_bytes({"E": state.params_E, "G": state.params_G})
                + 2 * tree_bytes(state.vars_D["params"]))
    ar = summary["all-reduce"]["bytes"]
    assert 0.98 <= ar / expected <= 1.5, (ar, expected, summary)
    for kind in ("all-gather", "reduce-scatter", "all-to-all"):
        assert summary[kind]["count"] == 0, summary


def test_vae_dp_program_is_pure_gradient_allreduce():
    from tools.dp_scaling import narrowed_config

    cfg = dataclasses.replace(narrowed_config(), init_std=1e-4)
    row = audit_vae(batch=16, cfg=cfg)
    assert row["n_devices"] == 8
    _assert_pure_dp(row)
