from .flow_match import (
    FlowMatchConfig,
    FlowMatchSchedule,
    QWEN_IMAGE_CONFIG,
    add_noise,
    adapter_t_range,
    build_schedule,
    calculate_shift,
    euler_step,
    qwen_inference_schedule,
    qwen_training_schedule,
    return_to_timestep,
    training_target,
)
