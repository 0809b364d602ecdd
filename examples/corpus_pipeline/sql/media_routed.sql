-- Route media assets by headers-only metadata (no decoder has run):
-- keep landscape videos at a sane frame rate (width > 0 — an
-- audio-only .m4a routes as a dimensionless video/mp4 row and must
-- NOT slip through 0 >= 0; fps_milli 5000-120000 = 5-120 fps, from
-- the video TRACK's stts sample count over its mdhd media duration),
-- still WebP images plus animations under two seconds total (ANMF
-- frame count + summed per-frame durations), and audio over two
-- seconds — the pre-decode admission rule of a multimodal pipeline.
SELECT doc_id, media_type, width, height, duration_ms, is_animated,
       n_frames, fps_milli
FROM media_metadata
WHERE (media_type = 'video/mp4' AND width > 0 AND width >= height
       AND fps_milli BETWEEN 5000 AND 120000)
   OR (media_type = 'image/webp'
       AND (n_frames = 1 OR (is_animated = 1 AND duration_ms < 2000)))
   OR (media_type = 'audio/mpeg' AND duration_ms >= 2000)
