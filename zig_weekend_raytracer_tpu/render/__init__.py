"""Rendering: camera ray generation, the wavefront integrator, and the
chunked renderer driver."""

from .camera import CameraParams, camera_params, generate_rays
from .integrator import trace_paths
from .renderer import Renderer
from .progressive import ProgressiveRenderer
