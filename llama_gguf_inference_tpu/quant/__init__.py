from .numpy_ref import SUPPORTED_TYPES, dequantize, quantize

__all__ = ["SUPPORTED_TYPES", "dequantize", "quantize"]
