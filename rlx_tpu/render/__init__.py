from rlx_tpu.render.offscreen import OffscreenRenderer, VideoWriter, render_rollout

__all__ = ["OffscreenRenderer", "VideoWriter", "render_rollout"]
