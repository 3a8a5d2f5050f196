"""Online serving: chunked enhancement with carried recurrent state."""

from rsrgan_tpu.serving.streaming import StreamingEnhancer
