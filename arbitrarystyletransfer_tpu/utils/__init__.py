from .cache import enable_compilation_cache
from .profiling import profile_trace, log_compile_time
