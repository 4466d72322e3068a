from .step import TrainState, make_image_train_step, create_train_state

__all__ = ["TrainState", "make_image_train_step", "create_train_state"]
