from pigo_tpu.io.image import get_image, decode_image, rgb_to_grayscale

__all__ = ["get_image", "decode_image", "rgb_to_grayscale"]
