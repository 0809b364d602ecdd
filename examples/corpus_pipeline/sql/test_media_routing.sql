-- empty = pass: no routed row may violate its own admission rule,
-- and no 'unknown' (undecodable) payload may ever be admitted
SELECT doc_id
FROM media_routed
WHERE media_type = 'unknown'
   OR (media_type = 'video/mp4'
       AND (width = 0 OR width < height
            OR fps_milli < 5000 OR fps_milli > 120000))
   OR (media_type IN ('image/webp', 'image/gif')
       AND n_frames != 1
       AND NOT (is_animated = 1 AND duration_ms < 2000))
   OR (media_type IN ('image/jpeg', 'image/png', 'image/bmp')
       AND (least(width, height) < 32 OR greatest(width, height) > 2048))
   OR (media_type IN ('audio/mpeg', 'audio/wav') AND duration_ms < 2000)
