from diffusionsat_tpu.train.adabelief import adabelief, cosine_decay_schedule
from diffusionsat_tpu.train.loop import TrainState, make_train_step, train
