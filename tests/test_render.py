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
