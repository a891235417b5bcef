from mclstexp_tpu.core import layers as layers
from mclstexp_tpu.core import losses as losses
