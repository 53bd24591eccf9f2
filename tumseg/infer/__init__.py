from tumseg.infer.voting import InferenceRunner, run_testing  # noqa: F401
