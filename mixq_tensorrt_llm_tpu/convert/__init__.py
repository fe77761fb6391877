from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from .calibrate import (calibrate_act_scales, load_act_scales,  # noqa: F401
                        save_act_scales)
from .hf import quantize_hf_model, load_hf_state_dict  # noqa: F401
from .lora import (merge_lora_into_state_dict, load_adapter,  # noqa: F401
                   build_lora_stack, attach_lora)
from .from_float import requantize  # noqa: F401
