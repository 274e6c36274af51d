from pct.pipeline.serial import (
    SerialEncoder,
    SerialDecoder,
    frames_to_block,
    block_to_frames,
)
from pct.pipeline.pipelined import CompressionPipeline, DecompressionPipeline
from pct.pipeline.queues import NotifyingQueue

__all__ = [
    "SerialEncoder",
    "SerialDecoder",
    "frames_to_block",
    "block_to_frames",
    "CompressionPipeline",
    "DecompressionPipeline",
    "NotifyingQueue",
]
