from mclstexp_tpu.ops import retrieval as retrieval
from mclstexp_tpu.ops import retrieval_sharded as retrieval_sharded
from mclstexp_tpu.ops import augment as augment
from mclstexp_tpu.ops import patches as patches
