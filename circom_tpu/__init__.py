"""circom-tpu: a TPU-native circom compiler and witness framework."""

from .compiler.executor import register_extern  # noqa: F401
