from .gaussians import GaussianMap  # noqa: F401
from .frame import Frame, PoseState, ExposureState  # noqa: F401
