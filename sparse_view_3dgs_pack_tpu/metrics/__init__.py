from .image_metrics import psnr_metric, ssim_metric
from .lpips import lpips
