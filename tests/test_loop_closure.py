"""Loop-closure stage (slam/loop_closure.py — framework extension; the
reference has no loop closure or pose graph, src/Mapper.py:262-484).

Fast tier: pure host logic (correction propagation, revisit gating).
Slow tier: a real-tracking synthetic SLAM run with the stage enabled —
the final refine must run, write its metrics event, and re-localization
against the converged map must pull a deliberately-perturbed pose back.
"""

import json
import os

import numpy as np
import pytest

from attentive_dfprior_tpu.config import default_config_path, load_config
from attentive_dfprior_tpu.slam.loop_closure import propagate_corrections


# ---------------------------------------------------------------------------
# fast tier: host-side logic
# ---------------------------------------------------------------------------


def _pose(tx=0.0, ty=0.0, tz=0.0, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    p = np.eye(4, dtype=np.float32)
    p[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    p[:3, 3] = [tx, ty, tz]
    return p


def test_propagate_corrections_keyframes_get_new_pose():
    traj = np.stack([_pose(tx=0.1 * t) for t in range(10)])
    kf_frames = np.array([0, 4, 8])
    old = traj[kf_frames].copy()
    new = old.copy()
    new[1] = _pose(tx=0.4 + 0.05)  # move kf at frame 4 by +5 cm
    new[2] = _pose(tx=0.8 - 0.02)
    propagate_corrections(traj, kf_frames, old, new, idx=9)
    np.testing.assert_allclose(traj[4], new[1], atol=1e-6)
    np.testing.assert_allclose(traj[8], new[2], atol=1e-6)
    # frame 0 untouched
    np.testing.assert_allclose(traj[0], _pose(tx=0.0), atol=1e-6)


def test_propagate_corrections_nearest_keyframe_delta():
    traj = np.stack([_pose(tx=0.1 * t) for t in range(10)])
    kf_frames = np.array([0, 4, 8])
    old = traj[kf_frames].copy()
    new = old.copy()
    delta = 0.07
    new[1, 0, 3] += delta  # translate kf 4
    propagate_corrections(traj, kf_frames, old, new, idx=9)
    # frames 3,5,6 are nearest to kf 4 -> carry its delta
    for t in (3, 5, 6):
        np.testing.assert_allclose(traj[t, 0, 3], 0.1 * t + delta, atol=1e-5)
    # frame 1 nearest kf 0 (unmoved), frame 9 nearest kf 8 (unmoved)
    np.testing.assert_allclose(traj[1, 0, 3], 0.1, atol=1e-5)
    np.testing.assert_allclose(traj[9, 0, 3], 0.9, atol=1e-5)


def test_propagate_corrections_rotation_composes_about_keyframe():
    """A rotated keyframe correction must left-compose (world-frame delta),
    not merely add — nearby frames swing with the keyframe."""
    traj = np.stack([_pose(tx=0.1 * t) for t in range(6)])
    kf_frames = np.array([0, 3])
    old = traj[kf_frames].copy()
    new = old.copy()
    rot = _pose(yaw=0.1)
    new[1] = (rot @ old[1].astype(np.float64)).astype(np.float32)
    expected_t4 = (rot @ traj[4].astype(np.float64)).astype(np.float32)
    propagate_corrections(traj, kf_frames, old, new, idx=5)
    np.testing.assert_allclose(traj[4], expected_t4, atol=1e-5)


def test_detect_revisit_gates_on_age_and_overlap():
    from attentive_dfprior_tpu.camera import Camera
    from attentive_dfprior_tpu.slam.keyframes import KeyframeStore
    from attentive_dfprior_tpu.slam.loop_closure import LoopCloser

    cam = Camera(H=60, W=80, fx=60.0, fy=60.0, cx=39.5, cy=29.5)
    kfs = KeyframeStore(4, cam.H, cam.W)
    depth = np.full((cam.H, cam.W), 2.0, np.float32)
    color = np.zeros((cam.H, cam.W, 3), np.float32)
    # same-pose keyframes at frames 0 and 5 -> overlap ~1 with the current
    # view at the same pose
    kfs.add(0, color, depth, _pose(), _pose())
    kfs.add(5, color, depth, _pose(), _pose())
    # the scorer keeps the reference's 20 px edge margin, so on this
    # 80x60 camera the maximum achievable score is the margin-interior
    # fraction (40*20)/(80*60) ~= 0.17 — gate accordingly
    cfg = {
        "loop_closure": {"enable": True, "min_gap": 20, "overlap_gate": 0.1},
        "tracking": {},
    }
    lc = LoopCloser(
        cfg, tracker=None, keyframes=kfs, cam=cam, rcfg=None,
        bound=np.zeros((3, 2), np.float32), tsdf_volume=None,
        tsdf_bnds=np.zeros((3, 2), np.float32),
    )
    # idx=10: both keyframes younger than min_gap=20 -> no revisit
    assert lc.detect_revisit(10, depth, _pose()) is None
    # idx=30: frame-0 keyframe is old enough and fully overlapping
    hit = lc.detect_revisit(30, depth, _pose())
    assert hit is not None and hit[1] > 0.1
    # far-away current pose: no overlap
    assert lc.detect_revisit(30, depth, _pose(tx=50.0)) is None


# ---------------------------------------------------------------------------
# slow tier: real run with the stage on
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lc_run(tmp_path_factory):
    from attentive_dfprior_tpu.slam.system import SLAMSystem

    cfg = load_config(
        os.path.join(
            os.path.dirname(__file__), "..", "configs", "Synthetic", "room.yaml"
        ),
        default_config_path(),
    )
    cfg["data"]["n_frames"] = 7
    # real tracking needs per-frame motion inside the render-tracker's
    # regime (room_tracking.yaml moves ~0.33 deg/frame); 120 deg over 7
    # frames would diverge regardless of loop closure
    cfg["data"]["arc_degrees"] = 12
    cfg["mapping"]["iters_first"] = 90
    cfg["mapping"]["iters"] = 90
    cfg["mapping"]["pixels"] = 1000
    cfg["mapping"]["lr_first_factor"] = 5
    cfg["mapping"]["keyframe_every"] = 5
    cfg["mapping"]["every_frame"] = 5
    cfg["mapping"]["color_refine"] = False
    cfg["meshing"]["resolution"] = 48
    cfg["tsdf"]["voxel_size"] = 0.03
    cfg["tracking"]["gt_camera"] = False
    cfg["tracking"]["iters"] = 20
    cfg["tracking"]["pixels"] = 400
    cfg["pretrained_decoders"]["low_high"] = ""
    cfg["rendering"]["N_samples"] = 24
    cfg["rendering"]["N_surface"] = 8
    cfg["cam"].update(H=60, W=80, fx=60.0, fy=60.0, cx=39.5, cy=29.5)
    cfg["loop_closure"] = {
        "enable": True,
        "final_refine": True,
        # tiny run: make the periodic gate reachable
        "every": 2,
        "min_gap": 3,
        "overlap_gate": 0.3,
    }
    cfg["verbose"] = False
    out = str(tmp_path_factory.mktemp("lc_out"))
    slam = SLAMSystem(cfg, output=out)
    slam.run()
    return slam, out


@pytest.mark.slow
def test_final_refine_event_logged(lc_run):
    slam, out = lc_run
    events = [
        json.loads(l)
        for l in open(os.path.join(out, "metrics.jsonl"))
        if l.strip()
    ]
    refine = [e for e in events if e.get("event") == "loop_final_refine"]
    assert len(refine) == 1
    assert refine[0]["frames"] >= 5


@pytest.mark.slow
def test_trajectory_stays_reasonable_with_lc(lc_run):
    slam, _ = lc_run
    est = slam.estimate_c2w_list
    gt = slam.gt_c2w_list
    err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    # the tiny-scene tracker is rough; loop closure must not blow it up
    assert float(err.max()) < 0.5


@pytest.mark.slow
def test_relocalize_pulls_perturbed_pose_back(lc_run):
    """Mechanism check: against the converged map, re-localization from a
    ~10 cm-perturbed init must reduce the pose error."""
    import jax

    slam, _ = lc_run
    idx, color, depth, gt_c2w = slam.dataset[3]
    true_pose = slam.estimate_c2w_list[3]
    pert = true_pose.copy()
    pert[:3, 3] += np.array([0.08, -0.05, 0.03], np.float32)
    ref, _ = slam.loop_closer._relocalize(
        slam.params, color, depth, pert, jax.random.PRNGKey(7), 20
    )
    err_before = np.linalg.norm(pert[:3, 3] - true_pose[:3, 3])
    err_after = np.linalg.norm(ref[:3, 3] - true_pose[:3, 3])
    assert err_after < err_before * 0.8
