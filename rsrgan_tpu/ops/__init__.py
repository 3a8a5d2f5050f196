"""Core compute ops: recurrent cells and shared elementwise helpers."""

from rsrgan_tpu.ops.common import gaussian_noise, leakyrelu, prelu
from rsrgan_tpu.ops.lstm import LstmCellP, StackedLstm
