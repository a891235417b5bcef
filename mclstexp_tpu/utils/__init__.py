from mclstexp_tpu.utils.meters import AvgMeter, Stopwatch  # noqa: F401
from mclstexp_tpu.utils import logging as logging  # noqa: F401
