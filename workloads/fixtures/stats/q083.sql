SELECT COUNT(*) FROM users as u, badges as b, postHistory as ph WHERE b.UserId = u.Id AND ph.UserId = u.Id AND u.Reputation<=585 AND u.Views>=152 AND b.Date>='2013-02-17 04:56:18'::timestamp;
