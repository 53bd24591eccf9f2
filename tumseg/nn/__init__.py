from tumseg.nn import layers  # noqa: F401
