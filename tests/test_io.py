"""Checkpoint roundtrip, PNG writer, renderer (native + NumPy), CLI smoke."""

import json
import os
import struct
import zlib

import numpy as np
import pytest

from pdb_sph_tpu import default_config, spawn
from pdb_sph_tpu.core.step import make_step
from pdb_sph_tpu.io import checkpoint, frames
from pdb_sph_tpu.render import renderer


def test_checkpoint_roundtrip(tmp_path):
    cfg = default_config(n=256)
    st = spawn(cfg, "dam_break", seed=5)
    st = make_step(cfg, backend="cell")(st)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, cfg, st)
    cfg2, st2 = checkpoint.load(path)
    assert cfg2 == cfg
    np.testing.assert_array_equal(np.asarray(st.x), np.asarray(st2.x))
    np.testing.assert_array_equal(np.asarray(st.v), np.asarray(st2.v))
    np.testing.assert_array_equal(np.asarray(st.ids), np.asarray(st2.ids))
    assert int(st2.step) == 1


def test_checkpoint_resume_continues(tmp_path):
    cfg = default_config(n=128)
    step = make_step(cfg, backend="cell")
    st = spawn(cfg, "standard", seed=1)
    for _ in range(3):
        st = step(st)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, cfg, st)
    _, st2 = checkpoint.load(path)
    a = step(st)
    b = step(st2)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))


def test_checkpoint_rejects_bad_version(tmp_path):
    cfg = default_config(n=16)
    st = spawn(cfg, "standard", seed=0)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, cfg, st)
    with np.load(path) as z:
        data = dict(z)
    data["format_version"] = np.int32(99)
    np.savez(path, **data)
    with pytest.raises(ValueError):
        checkpoint.load(path)


def test_write_png_is_valid(tmp_path):
    rgb = np.zeros((8, 6, 3), np.uint8)
    rgb[2, 3] = (255, 128, 0)
    path = str(tmp_path / "f.png")
    frames.write_png(path, rgb)
    raw = open(path, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", raw[16:24])
    assert (w, h) == (6, 8)
    # decode IDAT and check the pixel survives
    idat_at = raw.index(b"IDAT") + 4
    ln = struct.unpack(">I", raw[idat_at - 8 : idat_at - 4])[0]
    decoded = zlib.decompress(raw[idat_at : idat_at + ln])
    row2 = decoded[2 * (1 + 6 * 3) + 1 :][: 6 * 3]
    assert row2[9:12] == b"\xff\x80\x00"


def test_write_gif_is_valid_animation(tmp_path):
    rng = np.random.default_rng(1)
    frs = []
    for _ in range(3):
        f = np.zeros((24, 32, 3), np.uint8)
        f[:] = (12, 12, 20)
        ys, xs = rng.integers(0, 24, 5), rng.integers(0, 32, 5)
        f[ys, xs] = (135, 204, 250)
        frs.append(f)
    path = str(tmp_path / "a.gif")
    frames.write_gif(path, frs, fps=20)
    raw = open(path, "rb").read()
    assert raw[:6] == b"GIF89a"
    w, h = struct.unpack("<HH", raw[6:10])
    assert (w, h) == (32, 24)
    assert raw.count(b"\x21\xf9") == 3      # one graphic control per frame
    assert raw.endswith(b"\x3b")
    # stdlib-independent sanity: PIL not available; ensure every image
    # descriptor is present
    assert raw.count(b"\x2c\x00\x00\x00\x00") == 3


def test_frame_writer_gif(tmp_path):
    out = str(tmp_path / "frames")
    gif = str(tmp_path / "run.gif")
    with frames.FrameWriter(out, width=48, height=32, gif_path=gif) as w:
        for s in range(2):
            w.submit(s, np.random.rand(20, 3).astype(np.float32) + 0.5)
    raw = open(gif, "rb").read()
    assert raw[:6] == b"GIF89a" and raw.count(b"\x21\xf9") == 2


def test_write_gif_palette_survives_dark_first_frame(tmp_path):
    """A near-black first frame must not posterize the rest (round-1
    finding): the palette is built from an explicit cross-run sample."""
    dark = np.zeros((16, 16, 3), np.uint8)
    bright = np.full((16, 16, 3), (135, 204, 250), np.uint8)
    sample = np.concatenate([dark.reshape(-1, 3), bright.reshape(-1, 3)])
    path = str(tmp_path / "p.gif")
    frames.write_gif(path, [dark, bright], fps=10, palette_rgb=sample)
    raw = open(path, "rb").read()
    # global palette lives right after the 13-byte header; with the bright
    # color in the sample, some palette entry must be near the splat color
    pal_size = 2 << (raw[10] & 0x07)
    pal = np.frombuffer(raw[13 : 13 + 3 * pal_size], np.uint8)
    pal = pal.reshape(-1, 3).astype(int)
    d = np.abs(pal - np.array([135, 204, 250])).sum(1)
    assert d.min() < 30, "palette lost the splat color"


def test_frame_writer_surfaces_worker_error(tmp_path, monkeypatch):
    out = str(tmp_path / "frames")

    def boom(*a, **k):
        raise ValueError("synthetic render failure")

    monkeypatch.setattr(frames.renderer, "render", boom)
    w = frames.FrameWriter(out, width=32, height=24)
    w.submit(0, np.zeros((4, 3), np.float32))
    with pytest.raises(RuntimeError, match="frame writer failed"):
        # the error surfaces on a later submit or at close, never silently
        for s in range(1, 50):
            w.submit(s, np.zeros((4, 3), np.float32))
        w.close()


def test_renderer_native_builds_and_draws():
    assert renderer.have_native(), "g++ build of librasterizer.so failed"
    pos = np.array([[1.0, 1.0, 1.0]], np.float32)
    img = renderer.render(pos, 160, 120)
    assert img.shape == (120, 160, 3) and img.dtype == np.uint8
    # the splat is brighter than the background somewhere
    assert img.max() > 30


def test_renderer_numpy_matches_native_roughly():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0.2, 1.8, size=(200, 3)).astype(np.float32)
    a = renderer.render(pos, 128, 96)
    b = renderer._render_numpy(
        pos, 128, 96, renderer.DEFAULT_EYE, renderer.DEFAULT_TARGET,
        renderer.DEFAULT_FOV, renderer.POINT_SCALE, renderer.COLOR,
        renderer.BACKGROUND)
    assert a.shape == b.shape
    # identical pipelines modulo float details: most pixels agree
    frac_diff = np.mean(np.abs(a.astype(int) - b.astype(int)) > 8)
    assert frac_diff < 0.02


def test_frame_writer_async(tmp_path):
    out = str(tmp_path / "frames")
    with frames.FrameWriter(out, width=64, height=48) as w:
        for s in range(3):
            w.submit(s, np.random.rand(50, 3).astype(np.float32) + 0.5)
    assert w.frames_written == 3
    assert sorted(os.listdir(out)) == [
        "frame_000000.png", "frame_000001.png", "frame_000002.png"
    ]


def test_frame_writer_orbit_moves_camera(tmp_path):
    """--orbit's per-frame camera yaw (the headless fly-camera equivalent):
    identical particle positions must render DIFFERENTLY across frames when
    orbiting, and a full 360-degree orbit must land back on frame 0's view."""
    pos = (np.random.default_rng(3).random((80, 3)) * 0.8 + 0.6).astype(
        np.float32)
    out = str(tmp_path / "orbit")
    with frames.FrameWriter(out, width=64, height=48, orbit_deg=120.0) as w:
        for s in range(4):                  # 0, 120, 240, 360 degrees
            w.submit(s, pos)
    f = [frames.read_png(os.path.join(out, f"frame_{s:06d}.png"))
         for s in range(4)]
    assert not np.array_equal(f[0], f[1]), "orbit did not move the camera"
    assert not np.array_equal(f[1], f[2])
    np.testing.assert_array_equal(f[0], f[3])  # 360 degrees = full circle

    out2 = str(tmp_path / "static")
    with frames.FrameWriter(out2, width=64, height=48) as w:
        for s in range(2):
            w.submit(s, pos)
    g = [frames.read_png(os.path.join(out2, f"frame_{s:06d}.png"))
         for s in range(2)]
    np.testing.assert_array_equal(g[0], g[1])  # no orbit -> static camera
    np.testing.assert_array_equal(g[0], f[0])  # orbit frame 0 = base view


def test_cli_smoke(tmp_path):
    from pdb_sph_tpu.cli import main
    metrics = str(tmp_path / "m.jsonl")
    ck = str(tmp_path / "ck.npz")
    rc = main([
        "--scene", "standard", "--n", "256", "--steps", "4", "--chunk", "2",
        "--backend", "cell", "--metrics", metrics, "--metrics-every", "2",
        "--render-every", "2", "--out", str(tmp_path / "fr"),
        "--width", "64", "--height", "48", "--checkpoint", ck,
    ])
    assert rc == 0
    lines = [json.loads(l) for l in open(metrics)]
    assert lines[0]["event"] == "start"
    assert lines[-1]["event"] == "done"
    assert any("mean_density" in l for l in lines)
    assert os.path.exists(ck)
    cfg, st = checkpoint.load(ck)
    assert int(st.step) == 4 and cfg.n == 256
    assert len(os.listdir(str(tmp_path / "fr"))) >= 2

    # resume path
    rc = main(["--resume", ck, "--steps", "2", "--chunk", "2",
               "--backend", "cell", "--metrics", metrics])
    assert rc == 0


@pytest.mark.slow  # one shard_map compile (~minute on the fake-device mesh)
def test_cli_mesh_smoke(tmp_path):
    """VERDICT round 2 item 4: the app layer drives the mesh path end to
    end — metrics, a frame, and a resumable checkpoint on 8 fake devices."""
    from pdb_sph_tpu.cli import main
    metrics = str(tmp_path / "m.jsonl")
    ck = str(tmp_path / "ck.npz")
    rc = main([
        "--scene", "dam_break", "--n", "256", "--steps", "4", "--chunk", "2",
        "--backend", "cell", "--devices", "8", "--metrics", metrics,
        "--metrics-every", "2", "--render-every", "2",
        "--out", str(tmp_path / "fr"), "--width", "64", "--height", "48",
        "--checkpoint", ck, "--max-occ", "384", "--retier-at", "2",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in open(metrics)]
    assert lines[0]["event"] == "start" and lines[0]["devices"] == 8
    assert lines[-1]["event"] == "done"
    retier = [l for l in lines if l.get("event") == "retier"]
    assert len(retier) == 1 and retier[0]["step"] == 2
    assert retier[0]["capacity"][1] <= retier[0]["capacity"][0]
    prog = [l for l in lines if l.get("event") == "progress"]
    assert all(not l["nan_detected"] for l in prog)
    assert all(sum(l["per_shard_active"]) == 256 for l in prog)
    assert any("mean_density" in l for l in prog)
    assert os.path.exists(ck)
    cfg, st = checkpoint.load(ck)
    assert int(st.step) == 4 and cfg.n == 256
    assert len(os.listdir(str(tmp_path / "fr"))) >= 2

    # resume on the mesh
    rc = main(["--resume", ck, "--steps", "2", "--chunk", "2",
               "--backend", "cell", "--devices", "8", "--metrics", metrics,
               "--metrics-every", "0"])
    assert rc == 0
