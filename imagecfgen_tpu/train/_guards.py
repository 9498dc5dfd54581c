"""Shared trainer sanity checks."""
import sys


def resolve_batch(n: int, batch_size: int, multiple: int = 1) -> int:
    """Effective batch size for the first compile over an ``n``-sample set.

    Scanned epochs drop the partial remainder batch (static shapes), so a
    dataset smaller than one batch would run zero steps and report NaN
    metrics while silently leaving params untouched. The reference's torch
    loop instead emits one short final batch
    (``training_utils.batchify`` — reference image_scms/training_utils.py),
    so its scripts run fine on tiny datasets; match that spirit by clamping
    to the largest jit-friendly batch that fits (a multiple of the mesh's
    data-axis size so the sharded scan stays even), with a loud warning.
    """
    if n >= batch_size:
        return batch_size
    clamped = n // multiple * multiple
    if clamped == 0:
        raise ValueError(
            f"dataset ({n} samples) cannot fill even one batch element per "
            f"device on a {multiple}-device data axis")
    print(
        f"[trainer] dataset ({n} samples) is smaller than one batch "
        f"({batch_size}); clamping batch size to {clamped} for this run",
        file=sys.stderr)
    return clamped


def require_full_batch(n: int, batch_size: int) -> None:
    """Post-compile invariant: once the epoch program is built for
    ``batch_size``, every dataset fed to it must fill at least one batch
    (the scanned epoch would otherwise run zero steps and report NaN)."""
    if n < batch_size:
        raise ValueError(
            f"dataset ({n} samples) is smaller than one batch ({batch_size}); "
            "the scanned epoch would run zero steps and report NaN metrics "
            "— lower batch_size")
