from .photometric import (charbonnier_loss, l1_loss, l1_loss_mask, l2_loss)
from .ssim import fused_ssim, ssim
from .dwt import (compute_elf_map, compute_patch_dwt_loss, compute_wef_maps,
                  compute_wef_all_subbands, dwt_subband_loss,
                  get_dwt_subbands, make_heatmap_rgb)
from .depth import (depth_l1_loss, fsgs_depth_loss, pearson_corrcoef,
                    pseudo_depth_loss)
from .dng import (loss_depth_smoothness, margin_l1_loss, margin_l2_loss,
                  normalize_patches, patchify, patch_norm_mse_loss,
                  patch_norm_mse_loss_global)
from .nir import combined_nir_loss, compute_combined_residuals, l1_loss_nir, ssim_loss_nir

__all__ = [n for n in dir() if not n.startswith("_")]
