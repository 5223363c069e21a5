from .normals import (  # noqa: F401
    draw_phi_theta_domain,
    euclidean_to_spherical,
    normal2rgb,
)
