from tumseg.viz.writers import write_labels_txt, write_obj_pointcloud  # noqa: F401
