"""Training (a new capability over the reference): CTC fine-tuning for
recognizers and BCE+dice tile training for segmentation nets."""

from ocr_inference_tpu.training.train import (  # noqa: F401
    TrainState,
    ctc_loss_fn,
    init_train_state,
    make_optimizer,
    make_train_step,
    synthetic_ctc_batch,
)
from ocr_inference_tpu.training.segmentation import (  # noqa: F401
    init_seg_train_state,
    make_seg_train_step,
    seg_loss_fn,
    synthetic_seg_batch,
)
