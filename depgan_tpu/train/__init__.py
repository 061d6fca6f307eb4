from . import gan_trainer, state, uresnet_trainer, wgan_gp  # noqa: F401
from .gan_trainer import GanTrainer  # noqa: F401
from .state import Counters, GanTrainState, UResNetTrainState  # noqa: F401
from .uresnet_trainer import UResNetTrainer  # noqa: F401
