from tumseg.data.las import LasData, read_las, write_las  # noqa: F401
