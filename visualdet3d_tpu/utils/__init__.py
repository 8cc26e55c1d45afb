from visualdet3d_tpu.utils.logger import AverageMeter, LossLogger, MetricWriter
from visualdet3d_tpu.utils.timer import Timer, formatting_time, profile, trace
