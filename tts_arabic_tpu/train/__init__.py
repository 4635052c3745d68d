"""Training: losses, GAN components, train states and steps, loops."""
from .losses import (attention_binarization_loss, attention_ctc_loss,
                     fastpitch_loss, tacotron2_loss)

__all__ = ["attention_binarization_loss", "attention_ctc_loss",
           "fastpitch_loss", "tacotron2_loss"]
