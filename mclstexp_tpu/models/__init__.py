from mclstexp_tpu.models import image as image
from mclstexp_tpu.models import mclstexp as mclstexp
from mclstexp_tpu.models import spot as spot
