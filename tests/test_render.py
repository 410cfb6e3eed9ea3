"""Offscreen rollout renderer: software ray tracer (no GL in this image),
video/PNG sinks, and the end-to-end render_rollout path on the ant env
(reference capability: `ant/mjx/viewer.py:7-189`, headless here)."""

import os

import numpy as np
import pytest

from rlx_tpu.render import OffscreenRenderer, VideoWriter, render_rollout

ANT_XML = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "rlx_tpu", "environments", "locomotion", "ant", "data", "ant.xml",
)


def test_software_render_produces_scene():
    r = OffscreenRenderer(ANT_XML, width=160, height=120)
    import mujoco

    m = mujoco.MjModel.from_xml_path(ANT_XML)
    qpos = m.key_qpos[0] if m.nkey else m.qpos0
    img = r.render(np.asarray(qpos))
    r.close()
    assert img.shape == (120, 160, 3) and img.dtype == np.uint8
    # scene has sky, floor checker and body pixels: expect real variety
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 50
    # moving the robot changes the image
    qpos2 = np.array(qpos, np.float64)
    qpos2[0] += 0.5
    img2 = r.render(qpos2)
    assert (img != img2).any()


def test_video_writer_png_and_mp4(tmp_path):
    frames = [np.full((32, 48, 3), v, np.uint8) for v in (0, 128, 255)]

    png_dir = tmp_path / "frames"
    w = VideoWriter(str(png_dir))
    for f in frames:
        w.add(f)
    w.close()
    assert sorted(os.listdir(png_dir)) == [
        "frame_00000.png", "frame_00001.png", "frame_00002.png"
    ]

    mp4 = tmp_path / "clip.mp4"
    w = VideoWriter(str(mp4), fps=10)
    for f in frames:
        w.add(f)
    w.close()
    assert mp4.exists() and mp4.stat().st_size > 0


def test_render_rollout_ant(tmp_path):
    from rlx_tpu.config import create_model, make_config

    config = make_config(
        "ppo.tpu", "locomotion.ant.tpu",
        **{
            "algorithm.total_timesteps": 2 * 2 * 8,
            "algorithm.nr_steps": 8,
            "algorithm.minibatch_size": 8,
            "algorithm.nr_epochs": 1,
            "environment.nr_envs": 2,
            "runner.mesh_dp": 1,
        },
    )
    model = create_model(config)
    out = tmp_path / "rollout"
    frames = render_rollout(model, str(out), nr_steps=3, width=96, height=72)
    assert frames == 3
    assert len(os.listdir(out)) == 3


class _FakeBackend:
    """Stub render backend driving InteractiveViewer's state machine."""

    def __init__(self):
        self.frames = []
        self.camera_history = []
        self.zooms = []
        self.closed = False
        self._should_close = False

    def set_camera(self, mode):
        self.camera_history.append(mode)

    def set_key_callback(self, cb):
        self.key_cb = cb

    def set_scroll_callback(self, cb):
        self.scroll_cb = cb

    def zoom(self, amount):
        self.zooms.append(amount)

    def track(self, data):
        pass

    def render_frame(self, data, overlay_lines):
        self.frames.append(overlay_lines)

    def should_close(self):
        return self._should_close

    def close(self):
        self.closed = True


def test_interactive_viewer_state_machine():
    """Keyboard semantics of the reference GLFW viewer
    (`ant/mjx/viewer.py:87-99`): SPACE pause, TAB camera cycle, H menu,
    S/F speed factor, scroll zoom, overlay content, frame pacing."""
    from rlx_tpu.render.interactive import InteractiveViewer

    backend = _FakeBackend()
    viewer = InteractiveViewer(model=None, dt=1 / 60.0, backend=backend)
    viewer.target_render_time = 0.0  # no wall-clock sleeps in tests

    assert viewer.camera_mode == "static"
    backend.key_cb("tab")
    viewer.render(data=None)
    assert viewer.camera_mode == "follow"
    assert backend.camera_history[-1] == "follow"

    backend.key_cb("s")
    backend.key_cb("s")
    assert viewer.run_speed_factor == 0.25
    backend.key_cb("f")
    assert viewer.run_speed_factor == 0.5

    backend.key_cb("h")
    n_before = len(backend.frames)
    viewer.render(data=None)
    assert len(backend.frames) > n_before
    assert backend.frames[-1] is None  # menu hidden
    backend.key_cb("h")
    viewer.render(data=None)
    lines = dict(backend.frames[-1])
    assert lines["Camera mode:"] == "follow"
    assert "[S]lower, [F]aster" in lines.values()

    backend.scroll_cb(2.0)
    assert backend.zooms == [0.1]

    # pause: render loop keeps spinning until unpaused via the key callback
    backend.key_cb("space")
    assert viewer.paused
    spins = {"n": 0}
    orig = backend.render_frame

    def unpause_after_three(data, overlay):
        orig(data, overlay)
        spins["n"] += 1
        if spins["n"] == 3:
            backend.key_cb("space")

    backend.render_frame = unpause_after_three
    viewer.render(data=None)
    assert not viewer.paused and spins["n"] >= 3

    # window close stops the loop and marks the viewer closed
    backend._should_close = True
    viewer.render(data=None)
    assert viewer.closed or viewer.loop_count <= 1
    viewer.close()
    assert backend.closed
