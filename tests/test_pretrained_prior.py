"""Tests for the shipped pretrained low/high decoder prior.

Regression guards for the sigmoid-saturation ("near-plane") trap: SLAM's
first-frame mapping takes Adam steps of up to low_lr x lr_first_factor = 0.5
per grid coordinate (configs/df_prior.yaml). A pretrained decoder whose
feature Jacobian is too steep responds to one such step with occupancy
excursions past sigmoid(10x) f32 saturation — every ray then terminates at
its first sample, all gradients die, and the map is permanently stuck
(loss == sum(gt_depth) exactly). tools/pretrain_decoders.py trains under
feature noise at that scale to bound the Jacobian; these tests pin the
contract.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
NPZ = os.path.join(REPO, "pretrained", "low_high.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(NPZ), reason="shipped prior npz missing"
)


def _load_decoders():
    from attentive_dfprior_tpu.models.decoders import init_df_decoders
    from attentive_dfprior_tpu.tools.pretrain_decoders import load_pretrained_npz

    dec = init_df_decoders(jax.random.PRNGKey(0))
    return load_pretrained_npz(dec, NPZ)


def test_npz_loads_and_matches_shapes():
    dec = _load_decoders()
    assert dec["low"]["B"].shape == (3, 93)
    assert dec["high"]["fc_c"][0]["w"].shape[0] == 64  # 2*c_dim concat


def test_occupancy_bounded_under_adam_scale_perturbation():
    """One Adam step moves each grid coordinate by up to ~0.5; the decoder's
    occupancy response must stay well inside sigmoid(10x) f32 saturation
    (|occ| < ~1.9 is where alpha rounds to exactly 1.0f)."""
    from attentive_dfprior_tpu.models.decoders import mlp_decoder_forward

    dec = _load_decoders()
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-3, 3, (2000, 3)).astype(np.float32))
    c0 = jnp.asarray(rng.normal(0, 0.01, (2000, 32)).astype(np.float32))
    occ0 = np.asarray(mlp_decoder_forward(dec["low"], p, c0))
    # worst-case-ish Adam step: every channel kicked by +-0.5
    c1 = c0 + jnp.asarray(
        rng.choice([-0.5, 0.5], size=(2000, 32)).astype(np.float32)
    )
    occ1 = np.asarray(mlp_decoder_forward(dec["low"], p, c1))
    assert np.abs(occ0).max() < 1.9, "prior saturated at rest"
    assert np.percentile(np.abs(occ1), 99) < 1.9, (
        f"prior occupancy saturates under Adam-scale feature perturbation "
        f"(p99 |occ| = {np.percentile(np.abs(occ1), 99):.2f})"
    )


def test_first_frame_mapping_converges_with_prior():
    """A short low-stage run at the first-frame lr (0.5) must decrease the
    loss — the exact regime that used to hit the near-plane trap."""
    from attentive_dfprior_tpu.config import default_config_path, load_config
    from attentive_dfprior_tpu.ops.adam import adam_init
    from attentive_dfprior_tpu.slam.mapper import StageLRs, mapping_stage
    from attentive_dfprior_tpu.slam.system import SLAMSystem

    cfg = load_config(
        os.path.join(REPO, "configs", "Synthetic", "room.yaml"),
        default_config_path(),
    )
    cfg["data"]["n_frames"] = 3
    cfg["cam"].update(H=48, W=64, fx=48.0, fy=48.0, cx=31.5, cy=23.5)
    cfg["tsdf"]["voxel_size"] = 0.05
    cfg["rendering"]["N_samples"] = 24
    cfg["rendering"]["N_surface"] = 8
    cfg["pretrained_decoders"]["low_high"] = NPZ
    sys_ = SLAMSystem(cfg, output=os.path.join("/tmp", "prior_test_out"))
    assert sys_.scene_cfg.fix_high, "prior should freeze the high decoder"

    _, color, depth, gt_c2w = sys_.dataset[0]
    m = sys_.mapper
    n = 80  # lr 0.5 overshoots in the first few iters, then recovers
    lrs = StageLRs(0.0, 0.0, 0.5, 0.0, 0.0)  # low_lr 0.1 x lr_first_factor 5
    params = jax.tree_util.tree_map(jnp.copy, sys_.params)
    keys = jax.random.split(jax.random.PRNGKey(3), n)
    _, _, losses = mapping_stage(
        params, adam_init(sys_.params),
        jnp.asarray(color)[None], jnp.asarray(depth)[None],
        jnp.asarray(np.asarray(gt_c2w, np.float32))[None], None,
        m.tsdf_volume, m.tsdf_bnds, m.bound, keys, jnp.zeros((n,)), lrs,
        "low", 500, m.cam, m.rcfg, (True, True), 0.2, False,
    )
    losses = np.asarray(losses)
    assert losses[-1] < 0.5 * losses[0], (
        f"low-stage loss did not converge at first-frame lr: {losses[0]:.1f} "
        f"-> {losses[-1]:.1f}"
    )
    # and specifically NOT the trap plateau (loss == sum gt_depth)
    assert losses[-1] < 0.8 * float(np.asarray(depth).mean()) * 500, "near-plane trap"
