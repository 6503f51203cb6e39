from . import checkpoint
from .ae_trainer import AutoencoderTrainer, make_ae_eval_step, make_ae_train_step
from .ast_trainer import ASTTrainer, make_ast_train_step, make_stylize_fn
from .state import TrainState, create_train_state, make_optimizer
