# NOTE: keep this package import-light and jax-free — DataLoader worker
# processes (spawn) import dataset modules and must not drag in the TPU
# client.  Device-side transforms live in .transforms (imports jax).


def __getattr__(name):
    if name in ("letterbox", "letterbox_batch_device"):
        from . import transforms

        return getattr(transforms, name)
    raise AttributeError(name)
