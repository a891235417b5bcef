from mclstexp_tpu.infer import embed as embed
from mclstexp_tpu.infer import evaluate as evaluate
from mclstexp_tpu.infer import metrics as metrics
