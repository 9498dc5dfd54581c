"""Shared trainer sanity checks."""


def require_full_batch(n: int, batch_size: int) -> None:
    """Scanned epochs drop the partial remainder batch (static shapes), so a
    dataset smaller than one batch would run zero steps and report NaN
    metrics while silently leaving params untouched. Fail fast instead."""
    if n < batch_size:
        raise ValueError(
            f"dataset ({n} samples) is smaller than one batch ({batch_size}); "
            "the scanned epoch would run zero steps and report NaN metrics "
            "— lower batch_size")
