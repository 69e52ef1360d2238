"""Training engines."""

from .gan import (GanTrainState, create_gan_state, make_fused_gan_step,
                  make_gan_steps)
from .prototypes import calc_prototypes, make_prototype_step
from .pseudo import generate_pseudo_labels, make_pseudo_fns
from .seg import (SegTrainState, build_seg_eval_step, create_seg_state,
                  make_seg_train_step)
from .self_train import (SelfTrainState, create_self_train_state,
                         full2weak_coords, make_self_train_step,
                         prototype_weights)

__all__ = ["GanTrainState", "create_gan_state", "make_fused_gan_step",
           "make_gan_steps",
           "calc_prototypes", "make_prototype_step", "generate_pseudo_labels",
           "make_pseudo_fns", "SegTrainState", "build_seg_eval_step",
           "create_seg_state", "make_seg_train_step", "SelfTrainState",
           "create_self_train_state", "full2weak_coords",
           "make_self_train_step", "prototype_weights"]
