"""Native (C++) host-runtime components.

`fastloader` — multi-threaded batch gather/crop over RAM-cached record
arrays, the host half of the input pipeline (see `fastloader.cpp`).
Compiled on demand with g++ via `build.ensure_built()`; every caller
falls back to numpy when no toolchain is available, so the package
stays importable anywhere.
"""

from imagecaptioning_tpu.native.build import (ensure_built,  # noqa: F401
                                              gather_images_cropped,
                                              gather_records,
                                              is_available)
