"""ML layer (reference base/ml/: libSVM + Annoy wrappers, SURVEY.md §2.5)."""
from compv_tpu.ml.svm import (  # noqa: F401
    SvmConfig, SvmModel, svm_train, svm_predict, svm_decision,
    svm_save_json, svm_load_json, svm_cross_validate, svm_train_multiclass,
    svm_predict_multiclass, MultiClassSvm,
)
from compv_tpu.ml.knn import (  # noqa: F401
    KnnIndex, knn_build, knn_search, knn_save_json, knn_load_json,
    AnnConfig, ann_build, ann_search,
)
