from pose3d_tpu.viz.plots import (  # noqa: F401
    visualize_3d_pose,
    visualize_comparison,
    fig_to_image,
)
