"""Camera models and image-geometry utilities (TPU-native dynosam_cv layer).

Reference parity: /root/reference/dynosam_cv/ (Camera.hpp, CameraParams.hpp,
RGBDCamera.hpp, ImageContainer.hpp) — reimplemented as batched JAX functions
over plain arrays instead of cv::Mat wrappers.
"""

from dynosam_tpu.cv.camera import (  # noqa: F401
    CameraIntrinsics,
    backproject,
    backproject_uvz,
    project,
    in_image,
)
