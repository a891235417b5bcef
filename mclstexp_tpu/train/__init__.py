from mclstexp_tpu.train.state import TrainState, create_train_state  # noqa: F401
from mclstexp_tpu.train.step import make_train_step  # noqa: F401
from mclstexp_tpu.train import loop as loop  # noqa: F401
from mclstexp_tpu.train import checkpoint as checkpoint  # noqa: F401
