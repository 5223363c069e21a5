from .clouds import (  # noqa: F401
    draw_point_cloud,
    export_shape_visualizations,
    visualize_confusion_matrix,
    visualize_pc_experts,
    visualize_pc_overlay,
)
from .fv import draw_gaussian_points, draw_gaussians, visualize_fv  # noqa: F401
from .normals import (  # noqa: F401
    discrete_cmap,
    draw_line_segments,
    draw_phi_theta_domain,
    euclidean_to_spherical,
    normal2rgb,
    visualize_pc_normals,
)
