"""ctrlvio_tpu: TPU-native continuous-time rolling-shutter VIO.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
APRIL-ZJU/Ctrl-VIO (continuous-time VIO for rolling-shutter cameras with
online line-delay calibration, RA-L 2022).
"""

__version__ = "0.1.0"
