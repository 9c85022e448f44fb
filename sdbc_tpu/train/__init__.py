from sdbc_tpu.train.trainer import TrainConfig, TrainState, make_train_step, init_train_state

__all__ = ["TrainConfig", "TrainState", "make_train_step", "init_train_state"]
