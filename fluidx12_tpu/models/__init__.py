from fluidx12_tpu.models.smoke import SmokeModel
