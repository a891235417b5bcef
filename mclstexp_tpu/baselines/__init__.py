"""Baseline model families re-implemented TPU-first over the shared data layer
(SURVEY §2.2): BLEEP, HisToGene, Hist2ST, THItoGene — the comparison harness
the reference vendors under ``baselines/``.
"""

from mclstexp_tpu.baselines import graph as graph
from mclstexp_tpu.baselines import losses as losses
from mclstexp_tpu.baselines import models as models
from mclstexp_tpu.baselines import super_resolution as super_resolution
from mclstexp_tpu.baselines import trainer as trainer
