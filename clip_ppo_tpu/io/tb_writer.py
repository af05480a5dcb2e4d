"""TensorBoard event writer with the reference's exact tag semantics.

The metrics layer machine-reads these logs (`calculate_metrics.py:16-87`):
scalar tags like ``charts/episodic_return`` via ``Scalars()`` and the
disturbance severity via the *text tensor* tag
``config/disturbance_severity/text_summary``. This writer produces both
formats (simple_value scalars; DT_STRING tensors with the "text" plugin
metadata, as torch's SummaryWriter does) using tensorboard's own
EventFileWriter for the record framing — host I/O, no torch dependency.
"""

from __future__ import annotations

import time

from tensorboard.compat.proto.event_pb2 import Event
from tensorboard.compat.proto.summary_pb2 import Summary, SummaryMetadata
from tensorboard.compat.proto.tensor_pb2 import TensorProto
from tensorboard.compat.proto.tensor_shape_pb2 import TensorShapeProto
from tensorboard.summary.writer.event_file_writer import EventFileWriter


class SummaryWriter:
    """Minimal torch-SummaryWriter-compatible interface (add_scalar/add_text)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._writer = EventFileWriter(log_dir)

    def add_scalar(self, tag: str, value, global_step: int | None = None) -> None:
        summary = Summary(value=[Summary.Value(tag=tag, simple_value=float(value))])
        event = Event(summary=summary, wall_time=time.time())
        if global_step is not None:
            event.step = int(global_step)
        self._writer.add_event(event)

    def add_text(self, tag: str, text: str, global_step: int | None = None) -> None:
        # Matches the torch writer's layout: '<tag>/text_summary' with a
        # string TensorProto and the "text" plugin metadata — the format
        # `get_disturbance_severity` reads back (`calculate_metrics.py:57-87`).
        metadata = SummaryMetadata(
            plugin_data=SummaryMetadata.PluginData(
                plugin_name="text", content=b"{}"
            )
        )
        tensor = TensorProto(
            dtype=7,  # DT_STRING
            string_val=[text.encode("utf-8")],
            tensor_shape=TensorShapeProto(dim=[TensorShapeProto.Dim(size=1)]),
        )
        summary = Summary(
            value=[
                Summary.Value(
                    tag=tag + "/text_summary", metadata=metadata, tensor=tensor
                )
            ]
        )
        event = Event(summary=summary, wall_time=time.time())
        if global_step is not None:
            event.step = int(global_step)
        self._writer.add_event(event)

    def flush(self) -> None:
        self._writer.flush()

    def close(self) -> None:
        self._writer.close()


def hyperparameters_table(args_dict: dict) -> str:
    """Markdown hyperparameter table text (`ppo_minigrid.py:184-187`)."""
    rows = "\n".join([f"|{key}|{value}|" for key, value in args_dict.items()])
    return "|param|value|\n|-|-|\n%s" % rows
