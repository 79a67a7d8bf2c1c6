"""CTC fine-tuning (training is a new capability over the reference)."""

from ocr_inference_tpu.training.train import (  # noqa: F401
    TrainState,
    ctc_loss_fn,
    init_train_state,
    make_optimizer,
    make_train_step,
    synthetic_ctc_batch,
)
