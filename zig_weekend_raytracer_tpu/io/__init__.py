"""Image IO: byte-compatible PPM output (native C++ mmap writer with a numpy
fallback) and texture image decode (native stb decoder with a PIL fallback).
"""

from .ppm import encode_pixels, write_image, write_ppm
from .image import load_image
