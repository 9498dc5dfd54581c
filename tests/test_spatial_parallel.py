"""Height-sharded conv (shard_map + ppermute halo exchange) must equal the
unsharded conv bit-for-bit on the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagecfgen_tpu.ops.conv import conv2d
from imagecfgen_tpu.parallel.spatial import SPACE_AXIS, make_spatial_conv


@pytest.mark.parametrize("k,s,p", [(4, 2, 1), (3, 1, 1), (5, 1, 2), (6, 2, 2)])
def test_sharded_conv_matches_global(k, s, p):
    n_dev = 8
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), (SPACE_AXIS,))
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    b, h, w, cin, cout = 2, 64, 32, 3, 8
    x = jax.random.normal(k1, (b, h, w, cin))
    wgt = jax.random.normal(k2, (k, k, cin, cout)) * 0.1

    ref = conv2d(x, wgt, stride=s, padding=p)

    fn = make_spatial_conv(mesh, stride=s, padding=p)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, SPACE_AXIS, None, None)))
    ws = jax.device_put(wgt, NamedSharding(mesh, P()))
    out = fn(xs, ws)

    assert out.shape == ref.shape
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5), (
        np.abs(np.asarray(out) - np.asarray(ref)).max()
    )


def test_untileable_conv_rejected():
    mesh = Mesh(np.asarray(jax.devices()[:8]), (SPACE_AXIS,))
    with pytest.raises(ValueError):
        make_spatial_conv(mesh, stride=2, padding=1, kernel=5)
