"""tts_arabic_tpu — TPU-native Arabic TTS framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of nipponjo/tts-arabic-pytorch for
TPU: FastPitch and Tacotron2 acoustic models, HiFi-GAN and Vocos vocoders,
the Buckwalter/MSA text frontend, Shakkala/Shakkelha diacritizers, training
with GAN recipes, and batched high-throughput inference.
"""

__version__ = "0.1.0"
