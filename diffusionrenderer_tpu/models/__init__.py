from .dit import dit_forward, dit_param_count, init_dit_params
