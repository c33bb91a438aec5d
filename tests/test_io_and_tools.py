"""Tests for dataset IO, config YAML, visualization, snapshots, CLI driver."""

import os

import numpy as np
import pytest

from stereo_visual_slam_tpu.data import synthetic
from stereo_visual_slam_tpu.utils.config import Config
from stereo_visual_slam_tpu.utils import config_io


# ---------------- config YAML ----------------

def test_config_yaml_roundtrip(tmp_path):
    cfg = Config()
    p = str(tmp_path / "cfg.yaml")
    config_io.save_yaml(cfg, p)
    cfg2 = config_io.config_from_yaml(p)
    assert cfg2 == cfg


def test_config_overrides():
    cfg = config_io.config_from_dict(
        {"camera": {"fx": 100.0}, "keyframe": {"window_size": 5}}
    )
    assert cfg.camera.fx == 100.0
    assert cfg.camera.fy == 718.856  # untouched default
    assert cfg.keyframe.window_size == 5


def test_config_unknown_key_raises():
    with pytest.raises(KeyError):
        config_io.config_from_dict({"camera": {"focal": 1.0}})


# ---------------- KITTI reader ----------------

@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    """Write a 4-frame synthetic sequence in KITTI layout."""
    from PIL import Image

    root = tmp_path_factory.mktemp("kitti")
    seq = root / "sequences" / "07"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    cfg = Config()
    world = synthetic.make_world(cfg, n_frames=4, n_points=3000, seed=3)
    for f, left, right in synthetic.frames(world):
        Image.fromarray(left.astype(np.uint8)).save(
            seq / "image_0" / f"{f:06d}.png"
        )
        Image.fromarray(right.astype(np.uint8)).save(
            seq / "image_1" / f"{f:06d}.png"
        )
    cam = cfg.camera
    P0 = f"P0: {cam.fx} 0 {cam.cx} 0 0 {cam.fy} {cam.cy} 0 0 0 1 0"
    P1 = (
        f"P1: {cam.fx} 0 {cam.cx} {-cam.fx * cam.baseline} "
        f"0 {cam.fy} {cam.cy} 0 0 0 1 0"
    )
    (seq / "calib.txt").write_text(P0 + "\n" + P1 + "\n")
    # ground-truth poses file
    (root / "poses").mkdir()
    rows = []
    for T_c_w in world.poses_T_c_w:
        T_w_c = np.linalg.inv(T_c_w)
        rows.append(" ".join(str(v) for v in T_w_c[:3, :4].reshape(-1)))
    (root / "poses" / "07.txt").write_text("\n".join(rows) + "\n")
    return str(root), world


def test_kitti_reader(mini_kitti):
    from stereo_visual_slam_tpu.data import kitti

    root, world = mini_kitti
    seq = kitti.open_sequence(root, "07")
    assert seq.n_frames == 4
    cam = seq.camera
    assert abs(cam.fx - 718.856) < 1e-3
    assert abs(cam.baseline - 0.573) < 1e-6
    left, right = seq.frame(0)
    assert left.shape == world.config.image_hw
    assert left.dtype == np.uint8
    # ground truth loaded and matches
    assert seq.gt_T_c_w is not None
    np.testing.assert_allclose(seq.gt_T_c_w[1], world.poses_T_c_w[1], atol=1e-6)
    # direct sequence-dir open (reference /dataset param style)
    seq2 = kitti.open_sequence(os.path.join(root, "sequences", "07"))
    assert seq2.n_frames == 4


def test_cli_driver_on_kitti(mini_kitti, tmp_path, monkeypatch):
    from stereo_visual_slam_tpu import run_vslam

    # shallow fetch trail so per-frame records (and thus viz ticks) arrive
    # while the 4-frame run is still going (default trails 3 chunks)
    monkeypatch.setenv("SVS_FETCH_BEHIND", "1")
    root, world = mini_kitti
    pose_out = str(tmp_path / "traj.txt")
    plot_out = str(tmp_path / "traj.png")
    ply_out = str(tmp_path / "map.ply")
    rec_out = str(tmp_path / "frames.jsonl")
    viz_dir = str(tmp_path / "live")
    rc = run_vslam.main(
        [
            "--dataset", root, "--sequence", "07",
            "--pose-out", pose_out, "--lookahead", "0", "--quiet",
            "--plot", plot_out, "--ply", ply_out, "--record", rec_out,
            "--chunk", "2", "--viz-every", "2", "--viz-dir", viz_dir,
            "--cpu",
        ]
    )
    assert rc == 0
    assert os.path.exists(pose_out)
    assert os.path.exists(plot_out) and os.path.getsize(plot_out) > 1000
    assert os.path.exists(ply_out)
    with open(ply_out) as f:
        header = f.readline().strip()
    assert header == "ply"
    import json

    lines = [json.loads(l) for l in open(rec_out)]
    assert len(lines) >= 3

    # live viz channel (--viz-every): the three reference channels emitted
    # PERIODICALLY during the run — multiple distinct cloud snapshots and
    # pose/keyframe JSONL entries, not one post-hoc artifact
    clouds = sorted(
        f for f in os.listdir(viz_dir) if f.startswith("cloud_")
    )
    assert len(clouds) >= 2, clouds
    live = [json.loads(l) for l in open(os.path.join(viz_dir, "live.jsonl"))]
    assert len(live) >= 2
    assert "keyframes" in live[0] and "n_landmarks" in live[0]
    assert live[0]["frame_id"] < live[-1]["frame_id"]

    # bounded stage-ahead dataset mode (--rolling K) produces the same
    # trajectory file through the same pipeline
    pose_roll = str(tmp_path / "traj_rolling.txt")
    rc = run_vslam.main(
        [
            "--dataset", root, "--sequence", "07",
            "--pose-out", pose_roll, "--quiet", "--rolling", "2",
            "--chunk", "2", "--cpu",
        ]
    )
    assert rc == 0
    from stereo_visual_slam_tpu.pipeline import trajectory as traj_mod

    rows_a = traj_mod.read_trajectory(pose_out)
    rows_b = traj_mod.read_trajectory(pose_roll)
    assert sorted(rows_a) == sorted(rows_b)
    for fid in rows_a:
        np.testing.assert_array_equal(rows_a[fid], rows_b[fid])


# ---------------- snapshot / resume ----------------

def test_snapshot_resume(tmp_path):
    from stereo_visual_slam_tpu.pipeline.snapshot import load_snapshot, save_snapshot
    from stereo_visual_slam_tpu.pipeline.vo import VisualOdometry

    cfg = Config()
    world = synthetic.make_world(cfg, n_frames=10, n_points=6000, seed=1)
    frames = [(f, l, r) for f, l, r in synthetic.frames(world)]

    vo = VisualOdometry(cfg, enable_ba=False)
    for f, l, r in frames[:6]:
        vo.process(f, l, r)
    snap = str(tmp_path / "state.npz")
    save_snapshot(vo, snap)

    vo2 = VisualOdometry(cfg, enable_ba=False)
    load_snapshot(vo2, snap)
    assert vo2.next_kf_id == vo.next_kf_id
    assert vo2.map.n_keyframes() == vo.map.n_keyframes()
    assert vo2.map.n_landmarks() == vo.map.n_landmarks()

    # continue tracking seamlessly
    for f, l, r in frames[6:]:
        rec = vo2.process(f, l, r)
        assert rec["state"] in ("tracked", "pending")
    vo2.finish()
    assert len(vo2.estimates) >= 3
