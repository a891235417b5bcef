from mclstexp_tpu.data import genes as genes
from mclstexp_tpu.data import hvg as hvg
from mclstexp_tpu.data import normalize as normalize
from mclstexp_tpu.data import pipeline as pipeline
from mclstexp_tpu.data import synthetic as synthetic
from mclstexp_tpu.data.section import Section  # noqa: F401
