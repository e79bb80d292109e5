"""Face restoration helper: detect -> align/crop -> restore -> paste back.

Parity: /root/reference/basicsr/utils/face_util.py (FaceRestorationHelper:15
— dlib detection + 5/68-point landmarks, similarity warp to a 512 template,
inverse-affine paste-back). Geometry (template alignment, warping,
paste-back) is fully implemented with cv2; dlib-based detection is used when
dlib is installed and otherwise landmarks can be supplied directly
(`add_face_landmarks`) — this environment ships no face detector weights.
"""

from __future__ import annotations

import os
from typing import List, Optional

import cv2
import numpy as np

# 5-point template for a 512x512 aligned face (standard ArcFace layout x4)
FACE_TEMPLATE_512 = np.array(
    [[192.98138, 239.94708], [318.90277, 240.1936], [256.63416, 314.01935],
     [201.26117, 371.41043], [313.08905, 371.15118]], np.float32)


class FaceRestorationHelper:
    """Crop faces to an aligned template, then paste restored faces back."""

    def __init__(self, upscale_factor: int, face_size: int = 512):
        self.upscale_factor = upscale_factor
        self.face_size = (face_size, face_size)
        self.face_template = FACE_TEMPLATE_512 * (face_size / 512.0)

        self.input_img: Optional[np.ndarray] = None
        self.all_landmarks_5: List[np.ndarray] = []
        self.affine_matrices: List[np.ndarray] = []
        self.inverse_affine_matrices: List[np.ndarray] = []
        self.cropped_faces: List[np.ndarray] = []
        self.restored_faces: List[np.ndarray] = []
        self._dlib = None

    # -- detection ---------------------------------------------------------

    def init_dlib(self, detection_path: str, landmark5_path: str,
                  landmark68_path: Optional[str] = None) -> None:
        try:
            import dlib
        except ImportError as e:
            raise ImportError(
                'dlib is not available in this environment; either install '
                'it with the shape-predictor models, or supply landmarks '
                'directly via add_face_landmarks().') from e
        self._dlib = dlib
        self.face_detector = dlib.cnn_face_detection_model_v1(detection_path)
        self.shape_predictor_5 = dlib.shape_predictor(landmark5_path)
        if landmark68_path:
            self.shape_predictor_68 = dlib.shape_predictor(landmark68_path)

    def read_input_image(self, img_path: str) -> None:
        self.input_img = cv2.imread(img_path, cv2.IMREAD_COLOR)
        if self.input_img is None:
            raise IOError(f'cannot read {img_path}')

    def detect_faces(self, img_path: str, upsample_num_times: int = 1,
                     only_keep_largest: bool = False) -> int:
        """dlib detection + 5-point landmarks (face_util.py:53-86)."""
        if self._dlib is None:
            raise RuntimeError('call init_dlib() first (or use '
                               'add_face_landmarks to skip detection)')
        self.read_input_image(img_path)
        dets = self.face_detector(self.input_img, upsample_num_times)
        if only_keep_largest and len(dets):
            dets = [max(dets, key=lambda d: d.rect.area())]
        for det in dets:
            shape = self.shape_predictor_5(self.input_img, det.rect)
            pts = np.array([[p.x, p.y] for p in shape.parts()], np.float32)
            self.all_landmarks_5.append(pts)
        return len(dets)

    def add_face_landmarks(self, landmarks5: np.ndarray,
                           input_img: Optional[np.ndarray] = None) -> None:
        """Detector-free path: supply (5, 2) landmarks per face."""
        if input_img is not None:
            self.input_img = input_img
        self.all_landmarks_5.append(np.asarray(landmarks5, np.float32))

    # -- warping -----------------------------------------------------------

    def warp_crop_faces(self, save_cropped_path: Optional[str] = None,
                        save_inverse_affine_path: Optional[str] = None
                        ) -> List[np.ndarray]:
        """Similarity-warp each face to the template (face_util.py:121-152)."""
        assert self.input_img is not None, 'no input image'
        for idx, landmarks in enumerate(self.all_landmarks_5):
            affine, _ = cv2.estimateAffinePartial2D(
                landmarks, self.face_template, method=cv2.LMEDS)
            self.affine_matrices.append(affine)
            cropped = cv2.warpAffine(self.input_img, affine, self.face_size)
            self.cropped_faces.append(cropped)
            inv = cv2.invertAffineTransform(affine)
            inv *= self.upscale_factor
            self.inverse_affine_matrices.append(inv)
            if save_cropped_path:
                base, ext = os.path.splitext(save_cropped_path)
                cv2.imwrite(f'{base}_{idx:02d}{ext}', cropped)
            if save_inverse_affine_path:
                base, _ = os.path.splitext(save_inverse_affine_path)
                np.save(f'{base}_{idx:02d}.npy', inv)
        return self.cropped_faces

    def add_restored_face(self, face: np.ndarray) -> None:
        self.restored_faces.append(face)

    def paste_faces_to_input_image(self, save_path: Optional[str] = None
                                   ) -> np.ndarray:
        """Inverse-warp restored faces onto the upscaled input
        (face_util.py:157-184)."""
        h, w = self.input_img.shape[:2]
        h_up, w_up = h * self.upscale_factor, w * self.upscale_factor
        upsampled = cv2.resize(self.input_img, (w_up, h_up))
        assert len(self.restored_faces) == len(self.inverse_affine_matrices), (
            'length of restored_faces and affine_matrices are different.')

        for face, inv_affine in zip(self.restored_faces,
                                    self.inverse_affine_matrices):
            inv_restored = cv2.warpAffine(face, inv_affine, (w_up, h_up))
            mask = np.ones(self.face_size, np.float32)
            inv_mask = cv2.warpAffine(mask, inv_affine, (w_up, h_up))
            inv_mask_erosion = cv2.erode(
                inv_mask, np.ones((2 * self.upscale_factor,
                                   2 * self.upscale_factor), np.uint8))
            inv_face = inv_mask_erosion[:, :, None] * inv_restored
            total_face_area = np.sum(inv_mask_erosion)
            w_edge = int(total_face_area ** 0.5) // 20
            erosion_radius = w_edge * 2
            inv_mask_center = cv2.erode(
                inv_mask_erosion,
                np.ones((erosion_radius, erosion_radius), np.uint8))
            blur_size = w_edge * 2 + 1
            inv_soft_mask = cv2.GaussianBlur(inv_mask_center,
                                             (blur_size, blur_size), 0)
            inv_soft_mask = inv_soft_mask[:, :, None]
            upsampled = (inv_soft_mask * inv_face
                         + (1 - inv_soft_mask) * upsampled).astype(
                             upsampled.dtype)
        if save_path:
            from .img_util import imwrite
            imwrite(upsampled, save_path)
        return upsampled

    def clean_all(self) -> None:
        self.all_landmarks_5 = []
        self.affine_matrices = []
        self.inverse_affine_matrices = []
        self.cropped_faces = []
        self.restored_faces = []
