from .layout import ncthw_to_nthwc, nthwc_to_ncthw, to_5d_video
