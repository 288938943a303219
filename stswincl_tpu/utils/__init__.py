from stswincl_tpu.utils.logging import MetricLogger, AverageMeter, setup_logger
