SELECT COUNT(*) FROM site as s, question as q, comment as c, so_user as u
WHERE q.site_id = s.site_id AND c.post_id = q.id AND c.site_id = s.site_id
  AND c.user_id = u.id AND u.site_id = s.site_id
  AND s.site_name IN ('stackoverflow','serverfault') AND c.score >= 3
  AND u.reputation >= 50;
