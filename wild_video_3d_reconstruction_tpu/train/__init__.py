from .forward import TrainConfig, vonet_training_forward
from .loss import total_loss
