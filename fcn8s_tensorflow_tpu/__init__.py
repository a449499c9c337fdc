"""fcn8s_tensorflow_tpu — a TPU-native (JAX/XLA/Pallas/pjit) semantic
segmentation framework with the full capabilities of the TF1 reference
``pierluigiferrari/fcn8s_tensorflow``, redesigned TPU-first.

Quick start::

    from fcn8s_tensorflow_tpu import FCN8s
    model = FCN8s(num_classes=20)
    model.train(train_generator=..., epochs=10, ...)
    model.predict(images)
"""

__version__ = "0.1.0"

from .labels import NUM_TRAIN_CLASSES  # noqa: F401


def __getattr__(name):
    # Lazy imports: keep `import fcn8s_tensorflow_tpu.labels` cheap (no
    # jax/engine import) for data-prep-only use.
    if name == "FCN8s":
        from .engine.model import FCN8s

        return FCN8s
    if name == "BatchGenerator":
        from .data.generator import BatchGenerator

        return BatchGenerator
    if name == "DataError":
        from .data.generator import DataError

        return DataError
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
