"""Sharded-inference tests on the 8-device virtual CPU mesh: the data x
model (batch x latent-height) partitioned UNet forward must compile, run,
and match the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvi.core.config import TINY_UNET
from tvi.models.unet_st import UNetSpatioTemporalConditionModel
from tvi.parallel.inference_sharding import shard_unet_step
from tvi.parallel.mesh import MeshSpec, create_mesh


@pytest.mark.parametrize("data,model", [(8, 1), (2, 4), (4, 2)])
def test_sharded_forward_matches_single_device(rng, data, model):
    assert len(jax.devices()) == 8
    mesh = create_mesh(MeshSpec(data=data, model=model))
    unet = UNetSpatioTemporalConditionModel(TINY_UNET)
    b, f, h, w = data, 2, 16, 16   # h divisible by model axis
    params = unet.init_params(rng)
    sample = jax.random.normal(rng, (b, f, h, w, 9)) * 0.1
    ctx = (jnp.ones((b, 2, 32)), jnp.ones((b, 1, 32)))
    ids = jnp.zeros((b, 3))
    t = jnp.zeros((b,))

    ref, _ = unet.apply(params, sample, t, ctx, ids)

    fwd = shard_unet_step(unet, mesh)
    out = fwd(params, sample, t, ctx, ids)
    assert out.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(
            "data", None, "model", None, None)), out.ndim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
