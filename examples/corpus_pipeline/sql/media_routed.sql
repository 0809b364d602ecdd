-- Route media assets by headers-only metadata (no decoder has run):
-- keep landscape videos (width > 0 — an audio-only .m4a routes as a
-- dimensionless video/mp4 row and must NOT slip through 0 >= 0),
-- still WebP images, and audio over two seconds — the pre-decode
-- admission rule of a multimodal pipeline.  is_animated is projected
-- so the test can verify the WebP arm.
SELECT doc_id, media_type, width, height, duration_ms, is_animated
FROM media_metadata
WHERE (media_type = 'video/mp4' AND width > 0 AND width >= height)
   OR (media_type = 'image/webp' AND is_animated = 0)
   OR (media_type = 'audio/mpeg' AND duration_ms >= 2000)
