"""No-op wandb stub so the reference's flax implementations (which import
wandb unconditionally) can run for curve comparison. Not used by rlx_tpu
itself (rlx_tpu degrades gracefully without wandb)."""


class _Noop:
    def __call__(self, *a, **k):
        return _Noop()

    def __getattr__(self, name):
        return _Noop()


def __getattr__(name):
    return _Noop()
