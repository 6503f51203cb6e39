from .profiling import profile_trace, log_compile_time
