-- Route media assets by headers-only metadata (no decoder has run):
-- keep landscape videos, any WebP still image, and audio over two
-- seconds — the pre-decode admission rule of a multimodal pipeline.
SELECT doc_id, media_type, width, height, duration_ms
FROM media_metadata
WHERE (media_type = 'video/mp4' AND width >= height)
   OR (media_type = 'image/webp' AND is_animated = 0)
   OR (media_type = 'audio/mpeg' AND duration_ms >= 2000)
