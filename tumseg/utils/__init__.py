from tumseg.utils import labels  # noqa: F401
from tumseg.utils.timing import time_print, current_time  # noqa: F401
