from . import blender, image, image_folder, pointcloud  # noqa: F401
