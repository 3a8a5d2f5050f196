"""Online serving: chunked enhancement with carried recurrent state."""

from rsrgan_tpu.serving.pool import StreamPool
from rsrgan_tpu.serving.streaming import StreamingEnhancer
from rsrgan_tpu.serving.wav_stream import StreamingWavEnhancer

__all__ = ["StreamingEnhancer", "StreamingWavEnhancer", "StreamPool"]
