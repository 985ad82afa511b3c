"""Importable pipeline layer: the eval/train loop logic behind the CLIs."""

from .eval import (  # noqa: F401
    EvalPipeline,
    MetricsConsumer,
    VisPolicy,
    batch_stream,
    consume_mets,
    grow_val_state,
)
