from khronos_tpu.utils.timing import Timer, TimingRecorder
from khronos_tpu.utils.logging import ExperimentLogger, setup_output_directory

__all__ = ["Timer", "TimingRecorder", "ExperimentLogger", "setup_output_directory"]
