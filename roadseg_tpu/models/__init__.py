from roadseg_tpu.models.unet import UNet, input_size_needed, output_size_for_input  # noqa: F401
