from .fast_cocoeval import match_image, native_available
