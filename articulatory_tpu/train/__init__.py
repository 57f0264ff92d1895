from articulatory_tpu.train.optimizers import build_optimizer  # noqa: F401
from articulatory_tpu.train.schedulers import build_scheduler  # noqa: F401
from articulatory_tpu.train.gan import GANTrainState, make_train_step, make_eval_step  # noqa: F401
